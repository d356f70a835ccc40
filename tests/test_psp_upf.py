"""UPF pseudopotentials: parsing, Hankel transforms, SCF consistency.

The strongest check mirrors the reference's test/pseudos strategy: the GTH
Si pseudopotential exists both analytically (.hgh) and tabulated on a radial
grid (UPF conversion); their Fourier-space quantities must agree closely.
"""
import math
import os

import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.models.psp_hgh import load_psp_hgh
from dftk_tpu.models.psp_upf import parse_upf, simpson_weights, hankel

UPF_SI = str(__import__("pathlib").Path(__file__).parent / "data/pseudos/gth/Si.pbe-hgh.upf")
needs_upf = pytest.mark.skipif(not os.path.exists(UPF_SI),
                               reason="reference UPF file not available")


def test_simpson_weights_polynomials():
    # uniform grid, even number of intervals
    x = np.linspace(0, 1, 101)
    w = simpson_weights(x)
    for k in (0, 1, 2, 3, 4):
        assert abs(np.sum(w * x**k) - 1 / (k + 1)) < 1e-8
    # log-style nonuniform grid
    x = np.geomspace(1e-4, 2.0, 401)
    w = simpson_weights(x)
    assert abs(np.sum(w * x**2) - (2.0**3 - 1e-12) / 3) < 1e-5


def test_hankel_gaussian_analytic():
    """H[e^{-r^2/2}] (l=0) = (2 pi)^{3/2} e^{-p^2/2}."""
    r = np.linspace(1e-6, 12.0, 4001)
    r2f = r**2 * np.exp(-r**2 / 2)
    for p in (0.0, 0.5, 1.7, 3.0):
        val = float(hankel(r, r2f, 0, np.array([p])))
        ref = (2 * math.pi) ** 1.5 * math.exp(-p**2 / 2)
        assert abs(val - ref) < 1e-8


@needs_upf
def test_upf_matches_analytic_hgh():
    upf = parse_upf(UPF_SI)
    hgh = load_psp_hgh("pbe/si-q4")
    assert upf.Zion == 4
    assert upf.lmax == hgh.lmax
    assert upf.n_proj_radial(0) == hgh.n_proj_radial(0)

    p = np.array([0.3, 1.0, 2.5, 4.0])
    # local potential in Fourier space
    v_upf = upf.local_fourier(p)
    v_hgh = hgh.local_fourier(p)
    assert np.max(np.abs(v_upf - v_hgh)) < 2e-3, (v_upf, v_hgh)
    # projectors
    for l in range(hgh.lmax + 1):
        for i in range(1, min(upf.n_proj_radial(l), hgh.n_proj_radial(l)) + 1):
            b_upf = upf.projector_fourier(i, l, p)
            b_hgh = hgh.projector_fourier(i, l, p)
            assert np.max(np.abs(b_upf - b_hgh)) < 2e-2 * max(1, np.max(np.abs(b_hgh)))
    # KB couplings
    np.testing.assert_allclose(np.array(upf.h[0]), np.array(hgh.h[0]),
                               atol=2e-4)
    # DC energy correction
    assert abs(upf.energy_correction() - hgh.energy_correction()) < 2e-3


@needs_upf
def test_scf_with_upf_matches_hgh():
    from testcases import silicon
    lattice = silicon["lattice"]
    pos = silicon["positions"]

    def run(psp):
        Si = dftk.ElementPsp.from_symbol("Si", psp=psp)
        model = dftk.model_DFT(lattice, [Si, Si], pos, functionals="PBE")
        basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                                    fft_size=(17,) * 3)
        return dftk.self_consistent_field(basis, tol=1e-7,
                                          is_converged="energy")

    res_upf = run(UPF_SI)
    res_hgh = run("pbe/si-q4")
    assert abs(res_upf.total_energy - res_hgh.total_energy) < 5e-4


@needs_upf
def test_upf_pswfc_available():
    upf = parse_upf(UPF_SI)
    assert upf.n_pswfc() > 0   # used for PDOS / DFT+U
