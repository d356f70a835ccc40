"""Meta-GGA NLCC: core kinetic-energy density (tau_core) support.

ONCVPSP "metagga" UPF files carry a PP_TAUMOD block: the core kinetic-energy
density that must be added to the valence tau seen by a meta-GGA functional
(reference src/pseudo/PspUpf.jl:158,302-306, src/terms/xc.jl:45-53,100-104).
Without it SCAN/r2SCAN with NLCC psps is silently wrong.  Also pins the
variational consistency of the mGGA Hamiltonian: without symmetrization,
H (incl. the DivAgrad/Vtau part) is the exact gradient of the discrete
energy functional.
"""
import math
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.models.psp_upf import parse_upf, simpson_weights

_C_UPF = str(pathlib.Path(__file__).parent / "data/pseudos/C_m.upf")
_AL_UPF = str(pathlib.Path(__file__).parent / "data/pseudos/Al_m.upf")
needs_c_upf = pytest.mark.skipif(not os.path.exists(_C_UPF),
                                 reason="metagga UPF test file not available")

_LATTICE = 6.74 / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])


@needs_c_upf
def test_parse_tau_core():
    for path in (_C_UPF, _AL_UPF):
        psp = parse_upf(path)
        assert psp.has_core_tau()
        assert psp.has_core_density()
        # l=0 Hankel transform at p=0 equals the plain radial integral
        r = np.array(psp.rgrid)
        w = simpson_weights(r)
        integral = 4 * math.pi * float(np.sum(w * np.array(psp.r2_tau_core)))
        t0 = float(psp.core_tau_fourier(np.array([0.0]))[0])
        assert integral > 0
        assert abs(t0 - integral) < 1e-10 * integral
        # traced p^2 evaluator agrees with the numpy path
        psq = np.array([0.3, 1.7, 9.0])
        a = np.asarray(psp.core_tau_fourier(np.sqrt(psq)))
        b = np.asarray(psp.core_tau_fourier_sq(jnp.asarray(psq)))
        np.testing.assert_allclose(a, b, atol=1e-8)


@needs_c_upf
def test_tau_core_term_instantiation():
    """tau_core grid superposition is built for mGGA models only."""
    C = dftk.ElementPsp.from_symbol("C", psp=_C_UPF)
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    for fun, expect in (("SCAN", True), ("PBE", False)):
        model = dftk.model_DFT(_LATTICE, [C, C], pos, functionals=fun)
        basis = dftk.PlaneWaveBasis(model, Ecut=8.0, kgrid=(1, 1, 1),
                                    fft_size=(16,) * 3)
        assert basis.terms.rho_core_np is not None
        assert (basis.terms.tau_core_np is not None) == expect
        if expect:
            tc = basis.terms.tau_core_np
            assert tc.shape == basis.fft_size and tc.max() > 0.1
            # grid integral matches the Fourier-space G=0 value (2 atoms)
            psp = C.psp
            r = np.array(psp.rgrid)
            w = simpson_weights(r)
            per_atom = 4 * math.pi * float(
                np.sum(w * np.array(psp.r2_tau_core)))
            # coarse-grid + positivity clipping: ~1e-2 relative is expected
            assert abs(tc.mean() * model.unit_cell_volume - 2 * per_atom) \
                < 2e-2 * per_atom


@needs_c_upf
def test_scan_nlcc_scf_and_lattice_energy_consistency():
    """SCAN+NLCC SCF converges; the traced-lattice energy graph (which
    rebuilds rho_core AND tau_core via jnp Hankel transforms and recomputes
    tau from psi inside the trace) reproduces the SCF total energy, and its
    strain gradient matches its own finite difference."""
    from dftk_tpu.postprocess.stresses import energy_at_lattice
    C = dftk.ElementPsp.from_symbol("C", psp=_C_UPF)
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    model = dftk.model_DFT(_LATTICE, [C, C], pos, functionals="SCAN")
    basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(1, 1, 1),
                                fft_size=(18,) * 3)
    res = dftk.self_consistent_field(basis, tol=1e-11, maxiter=80)
    assert res.converged
    assert res.tau is not None

    # tau_core shifts the XC energy by a finite, visible amount
    from dftk_tpu.ops.hamiltonian import xc_energy
    terms = basis.terms
    vol = model.unit_cell_volume
    rho_xc = res.rho + jnp.asarray(terms.rho_core_np)[None]
    tau_c = jnp.asarray(terms.tau_core_np)[None]
    Gc = jnp.asarray(basis.G_cube_cart)
    E_with = float(xc_energy(terms.xc, rho_xc, Gc, vol, terms.xc_scaling,
                             tau=res.tau + tau_c))
    E_wo = float(xc_energy(terms.xc, rho_xc, Gc, vol, terms.xc_scaling,
                           tau=res.tau))
    assert abs(E_with - E_wo) > 1e-3

    L0 = jnp.asarray(model.lattice)
    E = float(energy_at_lattice(basis, res.psi, res.occupation, L0))
    assert abs(E - res.total_energy) < 1e-8

    f = lambda t: energy_at_lattice(basis, res.psi, res.occupation,
                                    L0 * (1 + t))
    g = float(jax.grad(f)(0.0))
    eps = 1e-6
    fd = float((f(eps) - f(-eps)) / (2 * eps))
    assert abs(g - fd) < 1e-5 * max(1.0, abs(fd))


@needs_c_upf
@pytest.mark.slow
def test_scan_nlcc_forces_against_finite_differences():
    """mGGA NLCC forces: the tau_core Vtau term is part of -dE/dR.

    symmetries=False: any 2-atom same-element cell keeps an accidental
    inversion through the bond midpoint whose fractional translation moves
    with the atoms; the FD energy then depends on positions through the
    symmetrizer itself, which a fixed-psi Hellmann-Feynman gradient cannot
    (and should not) capture.
    """
    C = dftk.ElementPsp.from_symbol("C", psp=_C_UPF)
    pos = [np.array([0.128, 0.124, 0.122]), -np.ones(3) / 8]

    def run(p):
        model = dftk.model_DFT(_LATTICE, [C, C], p, functionals="SCAN",
                               symmetries=False)
        basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(1, 1, 1),
                                    fft_size=(18,) * 3)
        return basis, dftk.self_consistent_field(basis, tol=1e-11,
                                                 maxiter=80)

    from dftk_tpu.postprocess.forces import compute_forces
    basis, res = run(pos)
    F = compute_forces(res)
    eps = 1e-4
    Es = []
    for s in (+1, -1):
        p2 = [p.copy() for p in pos]
        p2[0][0] += s * eps
        Es.append(run(p2)[1].total_energy)
    fd = -(Es[0] - Es[1]) / (2 * eps)
    assert abs(fd - float(F[0, 0])) < 5e-5

    # the tau_core force term is load-bearing
    tc = basis.terms.tau_core_np
    basis.terms.tau_core_np = None
    F0 = compute_forces(res)
    basis.terms.tau_core_np = tc
    assert abs(fd - float(F0[0, 0])) > abs(fd - float(F[0, 0]))


def test_mgga_scf_state_is_stationary():
    """Without symmetrization the converged mGGA state is an exact
    stationary point of the discrete energy functional: this pins the
    DivAgrad/Vtau Hamiltonian apply as the exact gradient of the
    tau-dependence of E (a sign/factor error in H_tau would show here).

    With symmetries the identity only holds up to the XC-aliasing level
    (~1e-4 for SCAN): rho is symmetrized but V applied raw pointwise,
    matching the reference and ABINIT (see scf/driver.py NOTE) - the
    symmetrized-V alternative was measured to break ABINIT golden parity.
    """
    from dftk_tpu.ops import hamiltonian as hamops
    from dftk_tpu.ops.density import (compute_density,
                                      compute_kinetic_energy_density)
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
    model = dftk.model_DFT(silicon["lattice"], [Si, Si],
                           silicon["positions"], functionals="SCAN",
                           symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=8.0, kgrid=(2, 2, 2),
                                fft_size=(16,) * 3)
    res = dftk.self_consistent_field(basis, tol=1e-12, maxiter=60)
    bd, vol = basis.data, model.unit_cell_volume
    occ = jnp.asarray(res.occupation)
    Gc = jnp.asarray(basis.G_cube_cart)

    def E_scf(psi):
        rho = compute_density(bd, psi, occ, basis.fft_size, vol, 1)
        tau = compute_kinetic_energy_density(bd, bd.Gpk_cart, psi, occ,
                                             basis.fft_size, vol, 1)
        V, Vtau, energies = hamops.total_potential(basis.terms, rho, Gc,
                                                   vol, tau=tau)
        ham = hamops.build_ham(bd, basis.terms.data, V, Vtau=Vtau)
        energies.update(hamops.psi_energies(ham, basis.terms, psi, occ,
                                            bd.kweights))
        return sum(energies.values())

    psi = res.psi
    d = (jax.random.normal(jax.random.PRNGKey(0), psi.shape)
         + 1j * jax.random.normal(jax.random.PRNGKey(1), psi.shape))
    d = d * bd.mask[:, None, :]
    ov = jnp.einsum("kmg,kng->kmn", psi.conj(), d)
    d_perp = d - jnp.einsum("kmn,kmg->kng", ov, psi)
    g = float(jax.grad(lambda t: E_scf(psi + t * d_perp))(0.0))
    assert abs(g) < 5e-6, g
