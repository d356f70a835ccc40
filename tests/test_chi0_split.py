"""Split-real (chip-path) chi0 vs the complex apply_chi0.

On-chip linear response (VERDICT #1's remaining on-chip gap): the
Sternheimer solve runs in realified J-adapted algebra with only real
device ops.  Same-state comparison against the complex path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.engine_split import prepare_split_data, realify_orbitals
from dftk_tpu.response.chi0 import apply_chi0, make_chi0_context
from dftk_tpu.response.chi0_split import (apply_chi0_split_ctx,
                                          make_chi0_split_context)

from testcases import make_silicon_model


@pytest.fixture(scope="module")
def si_state():
    m = make_silicon_model()
    basis = dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=(2, 2, 2),
                                fft_size=(16, 16, 16))
    res = dftk.self_consistent_field(basis, tol=1e-12, maxiter=60)
    r = basis.r_cube
    dV = 0.1 * (np.cos(2 * np.pi * r[..., 0])
                + np.sin(2 * np.pi * (r[..., 1] + r[..., 2])))[None]
    return basis, res, jnp.asarray(dV)


def _split_res(res, dtype):
    U = realify_orbitals(jnp.asarray(res.psi)).astype(dtype)
    nb = res.psi.shape[1]
    # realify_orbitals gives the PAIRED layout (2nb rows); keep the first
    # nb rows, which are exactly the csplit representation [x; y]
    U = U[:, :nb]
    return dict(U=U, occupation=np.asarray(res.occupation),
                eigenvalues=np.asarray(res.eigenvalues), rho=res.rho,
                epsF=float(res.epsF))


def test_chi0_split_matches_complex_f64(si_state):
    basis, res, dV = si_state
    ctx_c = make_chi0_context(res, basis)
    drho_c = np.asarray(apply_chi0(ctx_c, basis, dV, tol=1e-11))

    sd = prepare_split_data(basis, dtype=jnp.float64)
    ctx_s = make_chi0_split_context(basis, sd, _split_res(res, jnp.float64))
    drho_s = np.asarray(apply_chi0_split_ctx(basis, ctx_s, dV, tol=1e-11))
    assert np.abs(drho_s - drho_c).max() < 1e-9 * max(
        1.0, np.abs(drho_c).max())


def test_chi0_split_f32(si_state):
    basis, res, dV = si_state
    ctx_c = make_chi0_context(res, basis)
    drho_c = np.asarray(apply_chi0(ctx_c, basis, dV, tol=1e-11))
    sd = prepare_split_data(basis, dtype=jnp.float32)
    sr = _split_res(res, jnp.float32)
    ctx_s = make_chi0_split_context(basis, sd, sr)
    drho_s = np.asarray(apply_chi0_split_ctx(basis, ctx_s, dV, tol=1e-4))
    scale = np.abs(drho_c).max()
    assert np.abs(drho_s - drho_c).max() < 5e-4 * scale


@pytest.fixture(scope="module")
def al_state():
    """Metallic (T > 0) state: FCC aluminium with Gaussian smearing."""
    a = 7.65339
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    Al = dftk.ElementPsp.from_symbol("Al", psp="lda/al-q3")
    model = dftk.model_DFT(lattice, [Al], [np.zeros(3)],
                           functionals=["lda_x", "lda_c_vwn"],
                           temperature=1e-2, symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=6.0, kgrid=(3, 3, 3))
    res = dftk.self_consistent_field(basis, tol=1e-11, maxiter=60,
                                     n_bands=8, n_extra_bands=4)
    r = basis.r_cube
    dV = 0.05 * (np.cos(2 * np.pi * r[..., 0])
                 + np.sin(2 * np.pi * (r[..., 1] + r[..., 2])))[None]
    return basis, res, jnp.asarray(dV)


def test_chi0_split_metal_matches_complex(al_state):
    """Metallic chi0 on the chip path (VERDICT r2 item #1): the split
    divided-difference pair terms + occupation/Fermi-level response equal
    the complex metallic apply_chi0 (which is itself FD-validated in
    tests/test_chi0_metal.py)."""
    basis, res, dV = al_state
    ctx_c = make_chi0_context(res, basis)
    drho_c = np.asarray(apply_chi0(ctx_c, basis, dV, tol=1e-11,
                                   use_schur=False))

    sd = prepare_split_data(basis, dtype=jnp.float64)
    ctx_s = make_chi0_split_context(basis, sd, _split_res(res, jnp.float64))
    drho_s = np.asarray(apply_chi0_split_ctx(basis, ctx_s, dV, tol=1e-11))
    scale = max(1.0, np.abs(drho_c).max())
    assert np.abs(drho_s - drho_c).max() < 1e-9 * scale
    # the metallic terms are load-bearing: redo with T=0-style context
    # (epsF far below the spectrum kills fprime and the pair terms)
    ctx_0 = ctx_s._replace(epsF=jnp.asarray(-1e3))
    drho_0 = np.asarray(apply_chi0_split_ctx(basis, ctx_0, dV, tol=1e-11))
    assert np.abs(drho_0 - drho_c).max() > 1e-5 * scale


def test_chi0_split_metal_detail(al_state):
    """with_detail returns (drho, dpsi, df, depsF) matching the complex
    apply_chi0_generic detail (needed by metallic split DFPT)."""
    from dftk_tpu.ops import fft as fftops
    from dftk_tpu.response.chi0 import apply_chi0_generic
    basis, res, dV = al_state
    bd = basis.data
    ctx_c = make_chi0_context(res, basis)
    # complex dVpsi for all bands
    dV_k = jnp.asarray(dV)[bd.kspin]
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
        c, i, m, basis.fft_size))(ctx_c.psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
    dVpsi = jax.vmap(fftops.gather_from_cube)(
        jnp.fft.fftn(dV_k[:, None] * psir, axes=(-3, -2, -1)),
        bd.Gidx, bd.mask)
    drho_c, dpsi_c, df_c, depsF_c = apply_chi0_generic(
        ctx_c, basis, dVpsi, tol=1e-11, use_schur=False, with_detail=True)

    sd = prepare_split_data(basis, dtype=jnp.float64)
    ctx_s = make_chi0_split_context(basis, sd, _split_res(res, jnp.float64))
    drho_s, dpsi_s, df_s, depsF_s = apply_chi0_split_ctx(
        basis, ctx_s, dV, tol=1e-11, with_detail=True)
    np.testing.assert_allclose(np.asarray(df_s), np.asarray(df_c),
                               atol=1e-9)
    assert abs(float(depsF_s) - float(depsF_c)) < 1e-10
    np.testing.assert_allclose(np.asarray(drho_s), np.asarray(drho_c),
                               atol=1e-9)
    # electron count conservation: sum w df = 0
    w = np.asarray(basis.kweights)
    assert abs(float(np.sum(w[:, None] * np.asarray(df_s)))) < 1e-10


def test_dyson_split_matches_complex(si_state):
    """Self-consistent response on the split engine (chip path): the
    split-real Dyson solve equals the complex solve_dyson."""
    from dftk_tpu.response.chi0_split import (make_chi0_split_context,
                                              solve_dyson_split)
    from dftk_tpu.response.hessian import solve_dyson
    basis, res, dV = si_state
    drho_c, _ = solve_dyson(res, dV, tol=1e-9, sternheimer_tol=1e-11)
    sd = prepare_split_data(basis, dtype=jnp.float64)
    ctx = make_chi0_split_context(basis, sd, _split_res(res, jnp.float64))
    drho_s, _ = solve_dyson_split(basis, ctx, dV, res.rho, tol=1e-9,
                                  sternheimer_tol=1e-11)
    assert np.abs(np.asarray(drho_s) - np.asarray(drho_c)).max() < 1e-10
