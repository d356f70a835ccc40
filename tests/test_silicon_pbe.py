"""Silicon PBE vs ABINIT (reference test/silicon_pbe.jl golden values)."""
import numpy as np
import pytest

import dftk_tpu as dftk
from testcases import silicon

REF_EVALS_K0 = [-0.181210259413818, 0.258840553222639, 0.258840553225549,
                0.258840553228459, 0.351692348652324, 0.351692348656259,
                0.351692348660193, 0.380606400669216]
REF_ETOT = -7.854477356672080   # ABINIT, Ecut=25


def run_si_pbe(Ecut, grid_size, tol):
    Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                           functionals="PBE")
    basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=silicon["kgrid"],
                                fft_size=(grid_size,) * 3)
    return dftk.self_consistent_field(basis, tol=tol, n_bands=8,
                                      is_converged="energy")


def test_silicon_pbe_small():
    res = run_si_pbe(Ecut=7.0, grid_size=17, tol=1e-6)
    assert res.converged
    assert abs(res.total_energy - REF_ETOT) < 0.03
    assert np.abs(res.eigenvalues[0][:8] - np.array(REF_EVALS_K0)).max() < 0.03


@pytest.mark.slow
def test_silicon_pbe_large():
    res = run_si_pbe(Ecut=25.0, grid_size=33, tol=1e-9)
    assert abs(res.total_energy - REF_ETOT) < 1e-5
    assert np.abs(res.eigenvalues[0][:8] - np.array(REF_EVALS_K0)).max() < 1e-5


def test_mp_grid_equals_explicit_ibz():
    """IBZ-reduced MP grid gives the same energy as the explicit k-list."""
    Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                           functionals="PBE")
    b1 = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=dftk.MonkhorstPack((3, 3, 3)),
                             fft_size=(17,) * 3)
    b2 = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                             fft_size=(17,) * 3)
    r1 = dftk.self_consistent_field(b1, tol=1e-8, is_converged="energy")
    r2 = dftk.self_consistent_field(b2, tol=1e-8, is_converged="energy")
    assert abs(r1.total_energy - r2.total_energy) < 1e-7
