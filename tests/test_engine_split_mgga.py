"""Split-engine meta-GGA: tau, DivAgrad apply and SCAN SCF on chip.

The split (complex-free) engine gets the full mGGA feature set: a split
kinetic-energy density, the realified DivAgrad apply
(H_tau psi)(G') = 1/2 p'_a F[Vtau F^-1[p_a psi]] (reference
src/terms/operators.jl:145-161), Vtau out of the split XC AD, and the NLCC
tau_core shift (src/terms/xc.jl:100-104).  Pinned against the complex
engine in f64; f32 stays in the reference's Float32 envelope.
"""
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops import hamiltonian as hamops
from dftk_tpu.ops.density import (compute_kinetic_energy_density,
                                  guess_density, von_weizsaecker_tau)
from dftk_tpu.ops.engine_split import (apply_H_split, compute_tau_split,
                                       make_split_ham, prepare_split_data,
                                       realify_orbitals,
                                       self_consistent_field_split,
                                       total_potential_split,
                                       von_weizsaecker_tau_split)
from dftk_tpu.scf.driver import random_orbitals

_C_UPF = str(pathlib.Path(__file__).parent / "data/pseudos/C_m.upf")


@pytest.fixture(scope="module")
def si_scan_basis():
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
    model = dftk.model_DFT(silicon["lattice"], [Si, Si],
                           silicon["positions"], functionals="SCAN")
    return dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(2, 2, 2),
                               fft_size=(16,) * 3)


def test_tau_apply_split_matches_complex(si_scan_basis):
    basis = si_scan_basis
    model = basis.model
    vol = model.unit_cell_volume
    rho = guess_density(basis)
    tau = von_weizsaecker_tau(rho, jnp.asarray(basis.G_cube_cart))
    V, Vtau, _ = hamops.total_potential(basis.terms, rho,
                                        jnp.asarray(basis.G_cube_cart),
                                        vol, tau=tau)
    ham_c = hamops.build_ham(basis.data, basis.terms.data, V, Vtau=Vtau)
    psi = random_orbitals(basis, 5)
    H_c = hamops.apply_H(ham_c, psi, basis.fft_size, vol)

    sd = prepare_split_data(basis, dtype=jnp.float64)
    assert sd.Gpk_cart is not None
    ham_s = make_split_ham(sd, V, Vtau=Vtau)
    H_s = apply_H_split(ham_s, realify_orbitals(psi), basis.fft_size, vol)
    nG = basis.nG_max
    H_s_c = H_s[:, :5, :nG] + 1j * H_s[:, :5, nG:]
    assert float(jnp.max(jnp.abs(H_s_c - H_c))) < 1e-11
    # band-chunked variant takes the lax.map path of the tau chain
    H_s2 = apply_H_split(ham_s, realify_orbitals(psi), basis.fft_size, vol,
                         band_chunk=3)
    assert float(jnp.max(jnp.abs(H_s2 - H_s))) < 1e-12


def test_compute_tau_split_matches_complex(si_scan_basis):
    basis = si_scan_basis
    vol = basis.model.unit_cell_volume
    psi = random_orbitals(basis, 5)
    occ = jnp.ones((basis.n_kpoints, 5)) * 2.0
    tau_c = compute_kinetic_energy_density(basis.data, basis.data.Gpk_cart,
                                           psi, occ, basis.fft_size, vol, 1)
    sd = prepare_split_data(basis, dtype=jnp.float64)
    U = realify_orbitals(psi)
    occ_r = jnp.concatenate([occ, occ], axis=1) / 2
    tau_s = compute_tau_split(sd, U, occ_r, basis.fft_size, vol, 1)
    np.testing.assert_allclose(np.asarray(tau_s), np.asarray(tau_c),
                               atol=1e-11)
    tau_s2 = compute_tau_split(sd, U, occ_r, basis.fft_size, vol, 1,
                               band_chunk=4)
    np.testing.assert_allclose(np.asarray(tau_s2), np.asarray(tau_s),
                               atol=1e-12)
    # von Weizsaecker guess agrees between the split and complex DFT paths
    rho = guess_density(basis)
    tw_c = von_weizsaecker_tau(rho, jnp.asarray(basis.G_cube_cart))
    tw_s = von_weizsaecker_tau_split(rho, sd.G_cart)
    np.testing.assert_allclose(np.asarray(tw_s), np.asarray(tw_c), atol=1e-11)


def test_scan_split_scf_matches_complex_f64(si_scan_basis):
    basis = si_scan_basis
    res_c = dftk.self_consistent_field(basis, tol=1e-9,
                                       is_converged="energy", n_bands=8)
    res_s = self_consistent_field_split(basis, tol=1e-9, maxiter=50,
                                        n_bands=8, dtype=jnp.float64,
                                        diagtol_min=1e-8)
    assert res_s["converged"]
    assert res_s["tau"] is not None
    assert abs(res_s["energies"]["total"] - res_c.total_energy) < 1e-7
    assert np.max(np.abs(res_s["eigenvalues"][:, :8]
                         - res_c.eigenvalues[:, :8])) < 1e-6
    # the converged split tau agrees with the complex engine's
    assert float(jnp.max(jnp.abs(res_s["tau"] - res_c.tau))) < 1e-6


def test_scan_split_scf_f32(si_scan_basis):
    """f32 chip SCF within the reference's Float32 envelope (~1e-3 Ha)."""
    basis = si_scan_basis
    res64 = self_consistent_field_split(basis, tol=1e-9, maxiter=50,
                                        n_bands=8, dtype=jnp.float64,
                                        diagtol_min=1e-8)
    res32 = self_consistent_field_split(basis, tol=2e-5, maxiter=40,
                                        n_bands=8, dtype=jnp.float32)
    assert res32["converged"]
    assert abs(res32["energies"]["total"]
               - res64["energies"]["total"]) < 2e-3


@pytest.mark.skipif(not os.path.exists(_C_UPF),
                    reason="metagga UPF test file not available")
def test_scan_nlcc_split_matches_complex():
    """tau_core (NLCC mGGA) flows through the split XC potential too."""
    lattice = 6.74 / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    C = dftk.ElementPsp.from_symbol("C", psp=_C_UPF)
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    model = dftk.model_DFT(lattice, [C, C], pos, functionals="SCAN")
    basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(1, 1, 1),
                                fft_size=(18,) * 3)
    sd = prepare_split_data(basis, dtype=jnp.float64)
    assert sd.tau_core is not None

    # potential parity on a fixed (rho, tau)
    rho = guess_density(basis)
    tau = von_weizsaecker_tau(rho, jnp.asarray(basis.G_cube_cart))
    V_c, Vtau_c, en_c = hamops.total_potential(
        basis.terms, rho, jnp.asarray(basis.G_cube_cart),
        model.unit_cell_volume, tau=tau)
    V_s, Vtau_s, en_s = total_potential_split(basis.terms, sd, rho,
                                              model.unit_cell_volume,
                                              tau=tau)
    assert float(jnp.max(jnp.abs(V_s - V_c))) < 1e-10
    assert float(jnp.max(jnp.abs(Vtau_s - Vtau_c))) < 1e-10
    assert abs(float(en_s["Xc"]) - float(en_c["Xc"])) < 1e-10

    res_c = dftk.self_consistent_field(basis, tol=1e-9,
                                       is_converged="energy")
    res_s = self_consistent_field_split(basis, tol=1e-9, maxiter=60,
                                        dtype=jnp.float64, diagtol_min=1e-8)
    assert res_s["converged"]
    assert abs(res_s["energies"]["total"] - res_c.total_energy) < 1e-7
