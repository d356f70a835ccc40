"""Per-term Hamiltonian consistency (the reference's workhorse test,
test/hamiltonian_consistency.jl): for each term, the directional derivative
of the energy along a random orbital perturbation must match <dpsi|H|psi>
contributions computed from the operator.

Here the total-energy function E[psi] is differentiable, so we check
  dE/dt |_{t=0} psi+t*delta  ==  2 Re sum_kn w f <delta_kn | H psi_kn>
for single-term models, which validates each operator against its energy.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops import hamiltonian as hamops
from dftk_tpu.ops.density import compute_density
from dftk_tpu.scf.driver import random_orbitals


def _setup(term_types, functionals=None, Ecut=5.0):
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    terms = list(term_types)
    if functionals is not None:
        terms.append(dftk.Xc(functionals))
    model = dftk.Model(lattice=silicon["lattice"], atoms=[Si, Si],
                       positions=silicon["positions"], n_electrons=8,
                       term_types=terms, symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=(1, 2, 2),
                                fft_size=(15, 15, 15))
    return basis


def _energy_psi(basis, psi):
    model = basis.model
    occ = jnp.full(psi.shape[:2], float(model.filled_occupation))
    rho = compute_density(basis.data, psi, occ, basis.fft_size,
                          model.unit_cell_volume, 1)
    V, energies = hamops.total_potential(basis.terms, rho,
                                         jnp.asarray(basis.G_cube_cart),
                                         model.unit_cell_volume)
    ham = hamops.build_ham(basis.data, basis.terms.data, V)
    energies.update(hamops.psi_energies(ham, basis.terms, psi, occ,
                                        basis.data.kweights))
    return sum(energies.values()), ham, occ


TERMS = [
    ("kinetic", [dftk.Kinetic()], None),
    ("atomic_local", [dftk.Kinetic(scaling_factor=0.0), dftk.AtomicLocal()], None),
    ("nonlocal", [dftk.Kinetic(scaling_factor=0.0), dftk.AtomicNonlocal()], None),
    ("hartree", [dftk.Kinetic(scaling_factor=0.0), dftk.Hartree()], None),
    ("xc_lda", [dftk.Kinetic(scaling_factor=0.0)], ("lda_x", "lda_c_pw")),
    ("xc_pbe", [dftk.Kinetic(scaling_factor=0.0)], ("gga_x_pbe", "gga_c_pbe")),
]


@pytest.mark.parametrize("name,terms,funcs", TERMS, ids=[t[0] for t in TERMS])
def test_term_consistency(name, terms, funcs):
    basis = _setup(terms, funcs)
    psi = random_orbitals(basis, 4, seed=3)
    delta = random_orbitals(basis, 4, seed=11) * 0.1

    E0, ham, occ = _energy_psi(basis, psi)
    hpsi = hamops.apply_H(ham, psi, basis.fft_size,
                          basis.model.unit_cell_volume)
    w = basis.data.kweights[:, None] * occ
    analytic = 2 * float(jnp.sum(
        w * jnp.real(jnp.einsum("kng,kng->kn", delta.conj(), hpsi))))

    eps = 1e-5
    Ep, _, _ = _energy_psi(basis, psi + eps * delta)
    Em, _, _ = _energy_psi(basis, psi - eps * delta)
    fd = float((Ep - Em) / (2 * eps))
    assert abs(fd - analytic) < 1e-6 * max(1.0, abs(analytic)), \
        (name, fd, analytic)


# ---------------------------------------------------------------------------
# meta-GGA: tau enters the energy through psi, H gains the DivAgrad operator
# (reference hamiltonian_consistency.jl:157 tests mgga_x_tpss the same way)
# ---------------------------------------------------------------------------

def _energy_psi_mgga(basis, psi):
    from dftk_tpu.ops.density import compute_kinetic_energy_density
    model = basis.model
    bd = basis.data
    occ = jnp.full(psi.shape[:2], float(model.filled_occupation))
    rho = compute_density(bd, psi, occ, basis.fft_size,
                          model.unit_cell_volume, 1)
    tau = compute_kinetic_energy_density(bd, bd.Gpk_cart, psi, occ,
                                         basis.fft_size,
                                         model.unit_cell_volume, 1)
    V, Vtau, energies = hamops.total_potential(
        basis.terms, rho, jnp.asarray(basis.G_cube_cart),
        model.unit_cell_volume, tau=tau)
    ham = hamops.build_ham(bd, basis.terms.data, V, Vtau=Vtau)
    energies.update(hamops.psi_energies(ham, basis.terms, psi, occ,
                                        bd.kweights))
    return sum(energies.values()), ham, occ


@pytest.mark.parametrize("funcs", [("mgga_x_tpss",), ("mgga_c_tpss",),
                                   ("mgga_x_scan",)],
                         ids=["tpss_x", "tpss_c", "scan"])
def test_mgga_consistency(funcs):
    basis = _setup([dftk.Kinetic(scaling_factor=0.0)], funcs)
    psi = random_orbitals(basis, 4, seed=3)
    delta = random_orbitals(basis, 4, seed=11) * 0.1

    E0, ham, occ = _energy_psi_mgga(basis, psi)
    hpsi = hamops.apply_H(ham, psi, basis.fft_size,
                          basis.model.unit_cell_volume)
    w = basis.data.kweights[:, None] * occ
    analytic = 2 * float(jnp.sum(
        w * jnp.real(jnp.einsum("kng,kng->kn", delta.conj(), hpsi))))

    eps = 1e-5
    Ep, _, _ = _energy_psi_mgga(basis, psi + eps * delta)
    Em, _, _ = _energy_psi_mgga(basis, psi - eps * delta)
    fd = float((Ep - Em) / (2 * eps))
    assert abs(fd - analytic) < 2e-6 * max(1.0, abs(analytic)), \
        (funcs, fd, analytic)
