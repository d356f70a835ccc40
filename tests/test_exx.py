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
    # probe-charge G=0 contribution: (f^2/2/filled) * v(0)/Omega with f=2
    from dftk_tpu.ops.coulomb import Coulomb
    vol = basis.model.unit_cell_volume
    v0 = float(Coulomb().fourier(np.array([0.0]), vol)[0])
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
