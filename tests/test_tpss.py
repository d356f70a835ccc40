"""TPSS meta-GGA: exact-constraint checks + silicon SCF.

The reference dispatches :mgga_x_tpss/:mgga_c_tpss to libxc and exercises
them via Hamiltonian-consistency (reference test/hamiltonian_consistency.jl:157)
and an ABINIT input (test/testcases_ABINIT/silicon_TPSS); no golden energy is
pinned in-repo, so validation here is by the functional's published exact
constraints (TPSS paper, PRL 91, 146401 (2003)):

  * uniform gas (sigma -> 0, tau = tau_unif): TPSS == LSDA exchange + PW92
    correlation, for any density and spin polarization;
  * slowly-varying exchange: Fx = 1 + (10/81) p + O(p^2) on the alpha = 1
    manifold (the GE2 constraint TPSS is built around);
  * one-electron region (z = 1, iso-orbital): correlation vanishes
    in the fully spin-polarized limit (self-interaction freedom).
"""
import math

import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.xc.functionals import (FUNCTIONALS, lda_x_energy,
                                         lda_c_pw_energy)
from dftk_tpu.ops.xc.mgga import tpss_c_energy, tpss_x_energy


def _tau_unif(rho_s):
    """Uniform-gas kinetic energy density per spin channel [nspin, ...]."""
    nspin = rho_s.shape[0]
    # tau_s = (3/10) (3 pi^2)^{2/3} (2 rho_s)^{5/3} / 2  (spin scaling)
    return 0.3 * (3 * math.pi ** 2) ** (2 / 3) \
        * (nspin * rho_s) ** (5 / 3) / nspin


def test_tpss_uniform_gas_unpolarized():
    rho = np.array([[0.01, 0.1, 1.0, 5.0]])
    sigma = np.full((1, 4), 1e-24)
    tau = _tau_unif(rho)
    ex = np.asarray(tpss_x_energy(rho, sigma, tau))
    ec = np.asarray(tpss_c_energy(rho, sigma, tau))
    np.testing.assert_allclose(ex, np.asarray(lda_x_energy(rho)), rtol=1e-8)
    np.testing.assert_allclose(ec, np.asarray(lda_c_pw_energy(rho)),
                               rtol=1e-7)


def test_tpss_uniform_gas_polarized():
    rho = np.array([[0.4, 0.2, 1.2], [0.1, 0.2, 0.3]])
    sigma = np.full((3, 3), 1e-24)
    tau = _tau_unif(rho)
    ex = np.asarray(tpss_x_energy(rho, sigma, tau))
    ec = np.asarray(tpss_c_energy(rho, sigma, tau))
    np.testing.assert_allclose(ex, np.asarray(lda_x_energy(rho)), rtol=1e-8)
    np.testing.assert_allclose(ec, np.asarray(lda_c_pw_energy(rho)),
                               rtol=1e-6)


def test_tpss_exchange_ge2():
    """Fx - 1 - (10/81) p = O(p^2) on the alpha = 1 manifold."""
    r = 1.0
    kf = (3 * math.pi ** 2 * r) ** (1 / 3)
    errs = []
    for p in (1e-3, 5e-4, 2.5e-4):
        sig = p * (2 * kf * r) ** 2
        tau_w = sig / (8 * r)
        tau = tau_w + 0.3 * (3 * math.pi ** 2) ** (2 / 3) * r ** (5 / 3)
        ex = float(np.asarray(tpss_x_energy(
            np.array([[r]]), np.array([[sig]]), np.array([[tau]])))[0])
        ex_lda = float(np.asarray(lda_x_energy(np.array([[r]])))[0])
        Fx = ex / ex_lda
        errs.append(abs(Fx - 1 - 10.0 / 81.0 * p))
    # quadratic falloff: halving p quarters the error
    assert errs[1] < 0.3 * errs[0] and errs[2] < 0.3 * errs[1], errs


def test_tpss_one_electron_correlation_free():
    """Fully polarized iso-orbital region (z = 1): eps_c = 0 (TPSS is
    correlation self-interaction free)."""
    r = 0.7
    sig = 1.0
    tau_w = sig / (8 * r)     # z = tauW / tau = 1
    rho = np.array([[r], [1e-15]])
    sigma = np.array([[sig], [0.0], [0.0]])
    tau = np.array([[tau_w], [0.0]])
    ec = float(np.asarray(tpss_c_energy(rho, sigma, tau))[0])
    assert abs(ec) < 1e-6 * r, ec


def test_tpss_registered():
    assert "mgga_x_tpss" in FUNCTIONALS
    assert FUNCTIONALS["mgga_x_tpss"].family == "mgga"
    from dftk_tpu.ops.xc.functionals import resolve_functionals
    fs = resolve_functionals("TPSS")
    assert [f.name for f, _ in fs] == ["mgga_x_tpss", "mgga_c_tpss"]


def test_silicon_tpss_scf():
    """Silicon TPSS SCF runs and lands near the SCAN/LDA ballpark
    (the ABINIT input test/testcases_ABINIT/silicon_TPSS counterpart)."""
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                           functionals="TPSS")
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                                fft_size=(17,) * 3)
    res = dftk.self_consistent_field(basis, tol=1e-7, is_converged="energy",
                                     maxiter=40)
    assert res.converged
    # SCAN at this discretization gives ~-7.86; TPSS sits within ~0.1 Ha
    assert abs(res.total_energy - (-7.86)) < 0.1, res.total_energy
