"""Forces and stresses: autodiff derivatives vs finite differences.

Same strategy as the reference's test/forces.jl and test/stresses.jl
(directional finite-difference checks on small silicon setups).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk
from dftk_tpu.postprocess.forces import compute_forces, compute_forces_cart
from dftk_tpu.postprocess.stresses import compute_stresses_cart, energy_at_lattice


def _run_si(pos, Ecut=8.0, lattice_scale=1.0, tol=1e-10):
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    lattice = lattice_scale * silicon["lattice"]
    model = dftk.model_DFT(lattice, [Si, Si], pos,
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=(2, 2, 2),
                                fft_size=(18, 18, 18))
    return basis, dftk.self_consistent_field(basis, tol=tol, maxiter=50)


def test_forces_against_finite_differences():
    pos = [np.array([0.127, 0.125, 0.123]), -np.ones(3) / 8]
    basis, res = _run_si(pos)
    F = compute_forces(res)
    # translational sum rule (approximately; egg-box effects)
    assert np.abs(F.sum(axis=0)).max() < 1e-4

    eps = 1e-4
    Es = []
    for s in (+1, -1):
        p2 = [p.copy() for p in pos]
        p2[0][0] += s * eps
        _, r2 = _run_si(p2)
        Es.append(r2.total_energy)
    fd = -(Es[0] - Es[1]) / (2 * eps)
    assert abs(fd - F[0, 0]) < 1e-5


def test_forces_zero_at_symmetric_positions():
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    basis, res = _run_si(pos, tol=1e-11)
    F = compute_forces_cart(res)
    assert np.abs(F).max() < 1e-7


def test_stress_energy_consistency():
    """energy_at_lattice at the SCF lattice reproduces the SCF total energy."""
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    basis, res = _run_si(pos, tol=1e-11)
    E = float(energy_at_lattice(basis, res.psi, res.occupation,
                                jnp.asarray(basis.model.lattice)))
    assert abs(E - res.total_energy) < 1e-10


def test_stress_against_finite_differences():
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    basis, res = _run_si(pos, tol=1e-11)
    S = compute_stresses_cart(res)
    # cubic symmetry: diagonal isotropic, off-diagonal zero
    assert abs(S[0, 0] - S[1, 1]) < 1e-10
    assert abs(S[0, 1]) < 1e-10

    eps = 1e-5
    _, rp = _run_si(pos, lattice_scale=1 + eps)
    _, rm = _run_si(pos, lattice_scale=1 - eps)
    fd = (rp.total_energy - rm.total_energy) / (2 * eps)
    ad = np.trace(S) * basis.model.unit_cell_volume
    assert abs(fd - ad) < 1e-5
