"""k-point exact exchange (BEYOND the reference: DFTK restricts exchange to
Gamma, src/terms/exact_exchange.jl:52, and names the k-point generalisation
a TODO at exact_exchange.jl:31).

Validation is by EXACT supercell folding: a Hartree-Fock calculation on a
primitive cell with an n-point k-grid spans the identical variational space
as the Gamma-point calculation of the n-fold supercell (plane-wave spheres
|k+G|^2/2 <= Ecut tile exactly; with a FIXED truncation radius the exchange
kernels agree value-by-value), so the energies per unit cell must agree to
solver tolerance.
"""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.models.standard import _base_terms
from dftk_tpu.ops.coulomb import (Coulomb, SphericallyTruncatedCoulomb,
                                  WignerSeitzTruncatedCoulomb, exx_q_kernels)
from dftk_tpu.ops.terms import ExactExchange

L = 8.0
RC = 4.0          # fixed truncation radius -> identical kernels both routes
ECUT = 5.0


def _hf_model(lattice, atoms, positions):
    terms = _base_terms(0.0) + [
        ExactExchange(scaling_factor=1.0,
                      kernel=SphericallyTruncatedCoulomb(rc=RC))]
    return dftk.Model(lattice, list(atoms), list(positions),
                      term_types=terms, symmetries=False)


def _he():
    return dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")


def test_exx_kgrid_supercell_folding():
    He = _he()
    prim = _hf_model(np.diag([L, L, L]), [He], [np.array([.5, .5, .5])])
    bp = dftk.PlaneWaveBasis(prim, Ecut=ECUT, kgrid=(2, 1, 1),
                             fft_size=(16, 16, 16))
    rp = dftk.self_consistent_field(bp, tol=1e-10, maxiter=60,
                                    is_converged="energy")
    assert rp.converged

    sc = _hf_model(np.diag([2 * L, L, L]), [He, He],
                   [np.array([.25, .5, .5]), np.array([.75, .5, .5])])
    bs = dftk.PlaneWaveBasis(sc, Ecut=ECUT, kgrid=(1, 1, 1),
                             fft_size=(32, 16, 16))
    rs = dftk.self_consistent_field(bs, tol=1e-10, maxiter=60,
                                    is_converged="energy")
    assert rs.converged

    E_prim = rp.total_energy
    E_sc_per_cell = rs.total_energy / 2
    assert abs(E_prim - E_sc_per_cell) < 1e-7, (E_prim, E_sc_per_cell)
    # the exchange CHANNEL folds too (first-order in the residual state
    # error, so a looser bar than the variational total)
    assert abs(rp.energies["ExactExchange"]
               - rs.energies["ExactExchange"] / 2) < 3e-5


def test_exx_q_kernel_table():
    He = _he()
    m = _hf_model(np.diag([L, L, L]), [He], [np.array([.5, .5, .5])])
    b = dftk.PlaneWaveBasis(m, Ecut=ECUT, kgrid=(2, 2, 1),
                            fft_size=(16, 16, 16))
    kern = SphericallyTruncatedCoulomb(rc=RC)
    vq, iq = exx_q_kernels(kern, b)
    nk = b.n_kpoints
    assert iq.shape == (nk, nk)
    # q(i,j) = -q(j,i) and v is even in the TOTAL vector G+q, so the
    # opposite-q cube is the G-index-reversed one: v_{-q}(G) = v_q(-G)
    def grev(c):
        return c[np.ix_(*[(-np.arange(n)) % n for n in c.shape])]
    # exclude the Nyquist planes of the even grid, where G -> -G aliases
    # back onto itself and the identity cannot hold pointwise
    nn = [np.arange(n) != n // 2 for n in vq.shape[1:]]
    sel = np.ix_(nn[0], nn[1], nn[2])
    for i in range(nk):
        for j in range(nk):
            np.testing.assert_allclose(vq[iq[j, i]][sel],
                                       grev(vq[iq[i, j]])[sel],
                                       rtol=0, atol=1e-10)
    # the q=0 diagonal refers to one single kernel cube...
    assert len(set(iq[np.arange(nk), np.arange(nk)].tolist())) == 1
    # ...which matches the direct evaluation at q=0 (fixed rc: no BvK
    # rescaling enters for an explicit-radius kernel)
    i0 = int(iq[0, 0])
    Gsq = np.sum(b.G_cube_cart ** 2, axis=-1)
    np.testing.assert_allclose(vq[i0], kern.fourier(Gsq, 0.0), atol=1e-12)
    # 2x2x1 grid, UNWRAPPED differences (the convention the periodic-part
    # Fourier labels require): {0, 1/2} per axis -> {-1/2, 0, 1/2} -> 3x3x1
    assert vq.shape[0] == 9


def _realify(psi):
    import jax.numpy as jnp
    return jnp.concatenate([psi.real, psi.imag], axis=-1)


def test_exx_kgrid_split_energy_same_state():
    """Split-engine k-grid exchange energy vs the complex engine on the
    SAME converged state: pure algebra parity of the shifted-kernel
    generator scan (exx_split.apply_exchange_split iq path)."""
    import jax.numpy as jnp
    from dftk_tpu.ops.exx_split import exchange_energy_split
    He = _he()
    prim = _hf_model(np.diag([L, L, L]), [He], [np.array([.5, .5, .5])])
    b = dftk.PlaneWaveBasis(prim, Ecut=ECUT, kgrid=(2, 1, 1),
                            fft_size=(16, 16, 16))
    r_c = dftk.self_consistent_field(b, tol=1e-10, maxiter=60,
                                     is_converged="energy")
    U = _realify(r_c.psi)
    occ = r_c.occupation
    w = jnp.asarray(b.kweights)
    E_s = exchange_energy_split(
        jnp.asarray(b.terms.exx_kernel_np), U,
        w[:, None] * occ / b.model.filled_occupation, occ, w,
        jnp.asarray(b.Gidx_np), jnp.asarray(b.mask_np, dtype=U.dtype),
        b.fft_size, b.model.unit_cell_volume,
        iq=jnp.asarray(b.terms.exx_iq_np), kspin=jnp.asarray(b.kspin))
    assert abs(float(E_s) - float(r_c.energies["ExactExchange"])) < 1e-10


def test_exx_kgrid_split_ace_exact_on_span():
    """k-grid ACE (per-k compression of the cross-k generator sum)
    reproduces the bare shifted-kernel operator on the generating span."""
    import jax.numpy as jnp
    from dftk_tpu.ops.exx_split import (apply_ace_split,
                                        apply_exchange_split,
                                        build_ace_split)
    from dftk_tpu.ops.engine_split import self_consistent_field_split
    He = _he()
    prim = _hf_model(np.diag([L, L, L]), [He], [np.array([.5, .5, .5])])
    b = dftk.PlaneWaveBasis(prim, Ecut=ECUT, kgrid=(2, 1, 1),
                            fft_size=(16, 16, 16))
    r = self_consistent_field_split(b, tol=1e-10, maxiter=60,
                                    dtype=jnp.float64,
                                    eigensolver="lobpcg",
                                    is_converged="energy")
    U, occ = r["U"], r["occupation"]
    w = jnp.asarray(b.kweights)
    f_gen = w[:, None] * occ / b.model.filled_occupation
    kern = jnp.asarray(b.terms.exx_kernel_np)
    iq = jnp.asarray(b.terms.exx_iq_np)
    kspin = jnp.asarray(b.kspin)
    Gidx = jnp.asarray(b.Gidx_np)
    mask = jnp.asarray(b.mask_np, dtype=U.dtype)
    args = (Gidx, mask, b.fft_size, b.model.unit_cell_volume)
    xi = build_ace_split(kern, U, f_gen, *args, iq=iq, kspin=kspin)
    d = jnp.abs(apply_ace_split(xi, U)
                - apply_exchange_split(kern, U, f_gen, U, *args,
                                       iq=iq, kspin=kspin)).max()
    assert float(d) < 1e-9


def test_exx_kgrid_split_supercell_folding():
    """The supercell-folding validation run ENTIRELY through the split
    (chip) engine: HF on the primitive cell with a 2-point k-grid ==
    Gamma HF of the doubled supercell, per unit cell (f64 csplit repr)."""
    import jax.numpy as jnp
    from dftk_tpu.ops.engine_split import self_consistent_field_split
    He = _he()
    prim = _hf_model(np.diag([L, L, L]), [He], [np.array([.5, .5, .5])])
    bp = dftk.PlaneWaveBasis(prim, Ecut=ECUT, kgrid=(2, 1, 1),
                             fft_size=(16, 16, 16))
    rp = self_consistent_field_split(bp, tol=1e-10, maxiter=60,
                                     dtype=jnp.float64,
                                     eigensolver="lobpcg",
                                     is_converged="energy")
    assert rp["converged"]

    sc = _hf_model(np.diag([2 * L, L, L]), [He, He],
                   [np.array([.25, .5, .5]), np.array([.75, .5, .5])])
    bs = dftk.PlaneWaveBasis(sc, Ecut=ECUT, kgrid=(1, 1, 1),
                             fft_size=(32, 16, 16))
    rs = self_consistent_field_split(bs, tol=1e-10, maxiter=60,
                                     dtype=jnp.float64,
                                     eigensolver="lobpcg",
                                     is_converged="energy")
    assert rs["converged"]
    E_prim = rp["energies"]["total"]
    E_sc_per_cell = rs["energies"]["total"] / 2
    assert abs(E_prim - E_sc_per_cell) < 1e-7, (E_prim, E_sc_per_cell)
    assert abs(rp["energies"]["ExactExchange"]
               - rs["energies"]["ExactExchange"] / 2) < 3e-5


def test_exx_q_kernels_gamma_parity():
    """nq == 1 at Gamma and the cube equals the Gamma-only construction."""
    from dftk_tpu.ops.coulomb import kernel_fourier_cube
    He = _he()
    m = _hf_model(np.diag([L, L, L]), [He], [np.array([.5, .5, .5])])
    b = dftk.PlaneWaveBasis(m, Ecut=ECUT, kgrid=(1, 1, 1),
                            fft_size=(16, 16, 16))
    for kern in (Coulomb(), SphericallyTruncatedCoulomb(),
                 WignerSeitzTruncatedCoulomb()):
        vq, iq = exx_q_kernels(kern, b)
        assert vq.shape[0] == 1 and np.all(np.asarray(iq) == 0)
        np.testing.assert_allclose(vq[0], kernel_fourier_cube(kern, b),
                                   atol=0)
