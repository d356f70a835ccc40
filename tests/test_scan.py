"""Meta-GGA (SCAN): golden test against the reference suite's value.

DFTK's test/silicon_scan.jl pins E = -7.856498623457256 at Ecut=15,
fft 27^3, the silicon IBZ k-set (libxc-based SCAN); our pure-jnp SCAN with
AD tau-potential and DivAgrad operator must reproduce it.
"""
import numpy as np
import pytest

import dftk_tpu as dftk

REF_ETOT = -7.856498623457256
REF_K0 = [-0.205978425740779, 0.25380659461563, 0.25380659461831,
          0.254732985691879, 0.359893487572120, 0.35989348757842,
          0.36073308297652, 0.393192520642558]


@pytest.mark.slow
def test_silicon_scan_golden():
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                           functionals="SCAN")
    basis = dftk.PlaneWaveBasis(model, Ecut=15.0, kgrid=silicon["kgrid"],
                                fft_size=(27,) * 3)
    res = dftk.self_consistent_field(basis, tol=1e-9, is_converged="energy",
                                     maxiter=40, n_bands=8)
    assert abs(res.total_energy - REF_ETOT) < 5e-5
    assert np.abs(res.eigenvalues[0][:8] - np.array(REF_K0)).max() < 5e-5


def test_silicon_scan_small():
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                           functionals="SCAN")
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                                fft_size=(17,) * 3)
    res = dftk.self_consistent_field(basis, tol=1e-7, is_converged="energy",
                                     maxiter=40)
    assert res.converged
    assert abs(res.total_energy - REF_ETOT) < 0.05
