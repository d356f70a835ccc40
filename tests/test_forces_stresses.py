"""Forces and stresses: autodiff derivatives vs finite differences.

Same strategy as the reference's test/forces.jl and test/stresses.jl
(directional finite-difference checks on small silicon setups).
"""
import jax
import jax.numpy as jnp
import numpy as np
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


# ---------------------------------------------------------------------------
# NLCC (nonlinear core correction) force/stress contributions
# ---------------------------------------------------------------------------
# UPF psps with a core charge make Exc position-dependent
# (reference src/terms/xc.jl:200-297); without the core-XC term the forces
# on carbon-with-core are off by ~4e-5 Ha/bohr on this setup.

import os

_C_UPF = str(__import__("pathlib").Path(__file__).parent / "data/pseudos/C_m.upf")
needs_c_upf = pytest.mark.skipif(not os.path.exists(_C_UPF),
                                 reason="NLCC UPF test file not available")


def _run_c_nlcc(pos, tol=1e-10):
    C = dftk.ElementPsp.from_symbol("C", psp=_C_UPF)
    a = 6.74
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    model = dftk.model_DFT(lattice, [C, C], pos, functionals="PBE")
    basis = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(2, 2, 2),
                                fft_size=(20, 20, 20))
    return basis, dftk.self_consistent_field(basis, tol=tol, maxiter=60)


@needs_c_upf
@pytest.mark.slow
def test_nlcc_forces_against_finite_differences():
    pos = [np.array([0.128, 0.124, 0.122]), -np.ones(3) / 8]
    basis, res = _run_c_nlcc(pos)
    assert basis.model.atoms[0].has_core_density()
    assert basis.terms.rho_core_np is not None
    F = compute_forces(res)

    eps = 1e-4
    Es = []
    for s in (+1, -1):
        p2 = [p.copy() for p in pos]
        p2[0][0] += s * eps
        _, r2 = _run_c_nlcc(p2)
        Es.append(r2.total_energy)
    fd = -(Es[0] - Es[1]) / (2 * eps)
    assert abs(fd - F[0, 0]) < 2e-5

    # the core-XC term is load-bearing: removing it degrades the agreement
    basis.terms = basis.terms._replace(rho_core_np=None) \
        if hasattr(basis.terms, "_replace") else basis.terms
    try:
        basis.terms.rho_core_np = None
        F0 = compute_forces(res)
        assert abs(fd - F0[0, 0]) > abs(fd - F[0, 0])
    except AttributeError:
        pass  # frozen terms container: skip the ablation half


@needs_c_upf
def test_nlcc_stress_energy_consistency():
    """The traced-lattice energy (incl. the Hankel-rebuilt core density)
    reproduces the SCF total energy with an NLCC psp."""
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    basis, res = _run_c_nlcc(pos, tol=1e-11)
    E = float(energy_at_lattice(basis, res.psi, res.occupation,
                                jnp.asarray(basis.model.lattice)))
    assert abs(E - res.total_energy) < 1e-8

    # gradient of the traced graph vs FD of the same graph (fixed psi)
    L0 = jnp.asarray(basis.model.lattice)
    direction = jnp.asarray(np.eye(3))
    f = lambda t: energy_at_lattice(basis, res.psi, res.occupation,
                                    L0 * (1 + t))
    g = float(jax.grad(f)(0.0))
    eps = 1e-6
    fd = float((f(eps) - f(-eps)) / (2 * eps))
    assert abs(g - fd) < 1e-6 * max(1.0, abs(fd))


@pytest.mark.slow
def test_forces_spin_temperature():
    """Smeared spin-polarized silicon: AD forces vs finite differences
    (reference test/forces.jl 'Forces silicon (spin, temperature)')."""
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])

    def run(pos):
        m = dftk.model_DFT(silicon["lattice"], [Si, Si], pos,
                           functionals=["lda_x", "lda_c_pw"],
                           temperature=0.03,
                           spin_polarization="collinear")
        b = dftk.PlaneWaveBasis(m, Ecut=7.0, kgrid=(2, 1, 2),
                                fft_size=(18, 18, 18))
        from dftk_tpu.ops.density import guess_density
        rho0 = guess_density(b, magnetic_moments=[1.0, -1.0])
        return b, dftk.self_consistent_field(b, tol=1e-11, maxiter=80,
                                             rho=rho0)

    pos = [np.array([0.126, 0.125, 0.124]), -np.ones(3) / 8]
    basis, res = run(pos)
    F = compute_forces(res)
    eps = 1e-4
    Es = []
    for s in (+1, -1):
        p2 = [p.copy() for p in pos]
        p2[0][1] += s * eps
        _, r2 = run(p2)
        Es.append(r2.total_energy)
    fd = -(Es[0] - Es[1]) / (2 * eps)
    assert abs(fd - F[0, 1]) < 2e-5, (fd, F[0, 1])
