"""Metals (smearing, Fermi search, entropy) and collinear spin.

Golden values from the reference test suite (ABINIT cross-checks quoted in
test/iron_lda.jl:10-38).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.density import guess_density


def _iron_model(functionals=("lda_xc_teter93",), temperature=0.01):
    from testcases import iron_bcc
    Fe = dftk.ElementPsp.from_symbol("Fe", psp=iron_bcc["psp"])
    return dftk.model_DFT(iron_bcc["lattice"], [Fe], iron_bcc["positions"],
                          functionals=functionals, temperature=temperature,
                          magnetic_moments=[4.0],
                          smearing=dftk.Smearing.FermiDirac())


def run_iron(Ecut, fft, tol=1e-7, **kw):
    model = _iron_model()
    basis = dftk.PlaneWaveBasis(
        model, Ecut=Ecut, fft_size=(fft,) * 3,
        kgrid=dftk.MonkhorstPack((4, 4, 4), (0.5, 0.5, 0.5)))
    rho0 = guess_density(basis, magnetic_moments=[4.0])
    return basis, dftk.self_consistent_field(basis, tol=tol, rho=rho0,
                                             n_bands=8, maxiter=60, **kw)


def test_iron_lda_small():
    """Reduced cutoff: checks the whole collinear+smearing machinery runs
    and conserves electron count/spin structure."""
    basis, scfres = run_iron(Ecut=8.0, fft=16, tol=1e-6)
    assert scfres.converged
    n_elec = float(jnp.sum(scfres.rho) * basis.dvol)
    assert abs(n_elec - 8.0) < 1e-8
    assert scfres.occupation.max() <= 1.0 + 1e-10   # collinear: filled = 1
    assert scfres.rho.shape[0] == 2


@pytest.mark.slow
def test_iron_lda_golden():
    """ABINIT reference at Ecut=15, fft 20^3 (test/iron_lda.jl:37)."""
    basis, scfres = run_iron(Ecut=15.0, fft=20, tol=1e-8)
    assert scfres.converged
    assert abs(scfres.total_energy - (-16.670871429685356)) < 1e-5
    magn = float(jnp.sum(scfres.rho[0] - scfres.rho[1]) * basis.dvol)
    assert 2.3 < magn < 2.7   # ferromagnetic ground state


def test_aluminium_smearing():
    """Metallic Al supercell: Fermi-Dirac occupations sum to n_electrons."""
    from testcases import aluminium
    Al = dftk.ElementPsp.from_symbol("Al", psp=aluminium["psp"])
    model = dftk.model_DFT(aluminium["lattice"], [Al] * 4,
                           aluminium["positions"],
                           functionals=["lda_x", "lda_c_pw"],
                           temperature=aluminium["temperature"])
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=(1, 2, 2),
                                fft_size=(24, 9, 9))
    scfres = dftk.self_consistent_field(basis, tol=1e-6, maxiter=60)
    assert scfres.converged
    w = scfres.basis.kweights
    n_elec = float(np.sum(w[:, None] * scfres.occupation))
    assert abs(n_elec - 12.0) < 1e-8
    assert "Entropy" in scfres.energies
    # partial occupations actually occur in a metal
    occ = scfres.occupation
    assert np.any((occ > 1e-3) & (occ < 2 - 1e-3))


def test_fermi_level_methfessel_paxton():
    """Non-monotone smearing goes through the two-stage Fermi algorithm."""
    from dftk_tpu.ops.occupation import compute_occupation
    rng = np.random.default_rng(0)
    evals = jnp.asarray(np.sort(rng.normal(size=(4, 12)), axis=1))
    w = jnp.full((4,), 0.25)
    for smear in (dftk.Smearing.MethfesselPaxton(1),
                  dftk.Smearing.MarzariVanderbilt()):
        occ, epsF = compute_occupation(evals, w, 8, 2.0, 0.01, smear)
        n = float(jnp.sum(w[:, None] * occ))
        assert abs(n - 8.0) < 1e-8, smear


@pytest.mark.slow
def test_iron_pbe_golden():
    """ABINIT reference for spin-polarized iron PBE (reference
    test/iron_pbe.jl:49): Ecut=20, fft 20^3, MP(4,4,4) shifted grid.
    Like the reference, PBE runs on the largecore LDA GTH psp (Fe-q8)."""
    from testcases import iron_bcc
    Fe = dftk.ElementPsp.from_symbol("Fe", psp=iron_bcc["psp"])
    model = dftk.model_DFT(iron_bcc["lattice"], [Fe], iron_bcc["positions"],
                           functionals="PBE", temperature=0.01,
                           spin_polarization="collinear")
    basis = dftk.PlaneWaveBasis(
        model, Ecut=20.0, fft_size=(20,) * 3,
        kgrid=dftk.MonkhorstPack((4, 4, 4), (0.5, 0.5, 0.5)))
    rho0 = guess_density(basis, magnetic_moments=[4.0])
    scfres = dftk.self_consistent_field(basis, tol=1e-10, rho=rho0,
                                        n_bands=10, maxiter=80)
    assert scfres.converged
    assert abs(scfres.total_energy - (-18.21465922614397)) < 1e-5
    magn = float(jnp.sum(scfres.rho[0] - scfres.rho[1]) * basis.dvol)
    assert abs(magn - 2.98199463) < 5e-4
