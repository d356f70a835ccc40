"""Split-engine (chip-path) Gamma DFPT dynamical matrix vs the complex path.

Completes the on-chip response story: the bare displacement perturbations,
Sternheimer solves, Dyson screening and assembly all run in real-only
device arithmetic.  f64 same-state agreement with dynmat_dfpt_gamma.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.engine_split import prepare_split_data
from dftk_tpu.postprocess.unfold import unfold_bz
from dftk_tpu.response.phonon_dfpt import dynmat_dfpt_gamma
from dftk_tpu.response.phonon_split import dynmat_dfpt_gamma_split

from testcases import make_silicon_model


@pytest.mark.slow
def test_split_dfpt_gamma_matches_complex():
    m = make_silicon_model()
    basis = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(2, 2, 2))
    res = dftk.self_consistent_field(basis, tol=1e-12, maxiter=60)
    C_ref = dynmat_dfpt_gamma(res, tol=1e-8, sternheimer_tol=1e-11)

    res_u = unfold_bz(res)
    bu = res_u.basis
    sd = prepare_split_data(bu, dtype=jnp.float64)
    psi = np.asarray(res_u.psi)
    sr = dict(U=jnp.asarray(np.concatenate([psi.real, psi.imag], -1)),
              occupation=np.asarray(res_u.occupation),
              eigenvalues=np.asarray(res_u.eigenvalues),
              rho=jnp.asarray(res_u.rho))
    C = dynmat_dfpt_gamma_split(bu, sd, sr, tol=1e-8, sternheimer_tol=1e-11)
    assert np.abs(C - C_ref).max() < 1e-9


@pytest.mark.slow
def test_split_dfpt_gamma_metal_matches_complex():
    """Metallic (T > 0) split Gamma-DFPT equals the complex path: the
    occupation/Fermi-level response, divided-difference pairs and the
    df <psi|dV|psi> free-energy term all run in real-only device code
    (VERDICT r2 next-round item #1, metallic response on chip)."""
    a = 7.65339
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    Al = dftk.ElementPsp.from_symbol("Al", psp="lda/al-q3")
    m = dftk.model_DFT(lattice, [Al], [np.array([0.03, 0.0, 0.0])],
                       functionals=["lda_x", "lda_c_vwn"],
                       temperature=1e-2, symmetries=False)
    basis = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(2, 2, 2))
    res = dftk.self_consistent_field(basis, tol=1e-12, maxiter=80,
                                     n_bands=6, n_extra_bands=4)
    C_ref = dynmat_dfpt_gamma(res, tol=1e-8, sternheimer_tol=1e-11)

    res_u = unfold_bz(res)
    bu = res_u.basis
    sd = prepare_split_data(bu, dtype=jnp.float64)
    psi = np.asarray(res_u.psi)
    sr = dict(U=jnp.asarray(np.concatenate([psi.real, psi.imag], -1)),
              occupation=np.asarray(res_u.occupation),
              eigenvalues=np.asarray(res_u.eigenvalues),
              rho=jnp.asarray(res_u.rho), epsF=float(res_u.epsF))
    C = dynmat_dfpt_gamma_split(bu, sd, sr, tol=1e-8, sternheimer_tol=1e-11)
    assert np.abs(C - C_ref).max() < 1e-8
