"""Exact exchange and hybrid functionals (Gamma-point)."""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.models.standard import PBE0, model_HF


def _he_box(model_fn, Ecut=8.0, **kwargs):
    lattice = np.eye(3) * 10
    He = dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")
    m = model_fn(lattice, [He], [np.array([.5, .5, .5])], symmetries=False,
                 **kwargs)
    b = dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=(1, 1, 1))
    return b, dftk.self_consistent_field(b, tol=1e-8, maxiter=60,
                                         is_converged="energy")


def test_hf_exchange_cancels_half_hartree():
    """2 electrons in one orbital: E_x = -E_H/2 + the G=0 regularisation."""
    basis, res = _he_box(model_HF)
    assert res.converged
    EH = res.energies["Hartree"]
    Ex = res.energies["ExactExchange"]
    # probe-charge G=0 contribution: (f^2/2/filled) * v(0)/Omega with f=2;
    # v(0) read off the term's own regularised kernel (Gygi-Baldereschi)
    vol = basis.model.unit_cell_volume
    v0 = float(basis.terms.exx_kernel_np[0, 0, 0, 0])
    assert abs(Ex - (-EH / 2 - v0 / vol)) < 1e-4


def test_pbe0_between_pbe_and_hf():
    _, r_hf = _he_box(model_HF)
    _, r_pbe0 = _he_box(PBE0)
    _, r_pbe = _he_box(dftk.PBE)
    assert r_pbe0.converged
    # PBE0 energy lies between the PBE and HF results for this system
    lo, hi = sorted([r_hf.total_energy, r_pbe.total_energy])
    assert lo - 0.05 < r_pbe0.total_energy < hi + 0.05


def test_truncated_coulomb_kernels():
    from dftk_tpu.ops.coulomb import (Coulomb, LongRangeCoulomb,
                                      ShortRangeCoulomb,
                                      SphericallyTruncatedCoulomb)
    Gsq = np.array([0.0, 0.3, 1.7, 9.0])
    vol = 500.0
    full = Coulomb().fourier(Gsq, vol)
    sr = ShortRangeCoulomb(mu=0.2).fourier(Gsq, vol)
    lr = LongRangeCoulomb(mu=0.2).fourier(Gsq, vol)
    # range separation: SR + LR == full at G != 0
    np.testing.assert_allclose(sr[1:] + lr[1:], full[1:], rtol=1e-12)
    trunc = SphericallyTruncatedCoulomb().fourier(Gsq, vol)
    assert np.isfinite(trunc).all()
    assert trunc[0] > 0   # finite DC


def test_ace_matches_uncompressed():
    """ACE-compressed SCF and bare-operator SCF agree; ACE is exact on span."""
    import jax.numpy as jnp
    from dftk_tpu.ops import hamiltonian as hamops
    from dftk_tpu.ops.exx_ace import apply_ace, build_ace

    lattice = np.eye(3) * 8
    He = dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")
    m = model_HF(lattice, [He], [np.array([.5, .5, .5])], symmetries=False)
    b = dftk.PlaneWaveBasis(m, Ecut=8.0, kgrid=(1, 1, 1))
    r_ace = dftk.self_consistent_field(b, tol=1e-8, maxiter=60,
                                       is_converged="energy", use_ace=True)
    r_raw = dftk.self_consistent_field(b, tol=1e-8, maxiter=60,
                                       is_converged="energy", use_ace=False)
    assert r_ace.converged and r_raw.converged
    # energy-increment convergence at 1e-8 leaves ~1e-6 absolute slack
    assert abs(r_ace.total_energy - r_raw.total_energy) < 5e-6

    # operator-level exactness on the generating span
    psi = jnp.asarray(r_ace.psi)
    occ = jnp.asarray(r_ace.occupation) / m.filled_occupation
    V, _ = hamops.total_potential(b.terms, r_ace.rho,
                                  jnp.asarray(b.G_cube_cart),
                                  m.unit_cell_volume)
    ham = hamops.build_ham(b.data, b.terms.data, V,
                           exx_kernel=jnp.asarray(b.terms.exx_kernel_np[0]),
                           exx_psi=psi, exx_occ=occ)
    Xi = build_ace(ham, b.fft_size, m.unit_cell_volume)
    d = jnp.abs(apply_ace(Xi, psi)
                - hamops._apply_exchange(ham, psi, b.fft_size,
                                         m.unit_cell_volume)).max()
    assert float(d) < 1e-10
