"""Ewald electrostatics: reference values and force consistency."""
import numpy as np
import jax
import jax.numpy as jnp

from dftk_tpu.ops.ewald import energy_ewald, energy_forces_ewald


def test_madelung_nacl():
    """Rock-salt Madelung constant: E = -alpha q^2 / (2 r_nn) per ion pair,
    alpha = 1.7475645946...  Unit cube with ions at (0,0,0) and (1/2,1/2,1/2)
    ... actually use the standard 8-atom conventional cell."""
    a = 2.0
    lattice = np.eye(3) * a
    # NaCl conventional cell: 4 Na + 4 Cl
    na = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]]
    cl = [[.5, 0, 0], [0, .5, 0], [0, 0, .5], [.5, .5, .5]]
    charges = np.array([1.0] * 4 + [-1.0] * 4)
    positions = np.array(na + cl)
    E = float(energy_ewald(lattice, charges, positions))
    alpha = 1.7475645946331822
    r_nn = a / 2
    E_ref = -4 * alpha / (2 * r_nn) * 2  # 4 ion pairs, q=1, both signs counted once
    # E per cell = - N_pairs * alpha q^2 / r_nn with N_pairs=4
    assert abs(E - (-4 * alpha / r_nn)) < 1e-8, (E, -4 * alpha / r_nn)


def test_forces_match_finite_differences():
    lattice = np.array([[0.0, 5.13, 5.13], [5.13, 0.0, 5.13], [5.13, 5.13, 0.0]])
    charges = np.array([4.0, 4.0])
    pos = np.array([[0.126, 0.124, 0.125], [-0.125, -0.125, -0.125]])
    E0, F = energy_forces_ewald(lattice, charges, pos)
    eps = 1e-6
    for alpha in range(3):
        dp = pos.copy()
        dp[0, alpha] += eps
        Ep = float(energy_ewald(lattice, charges, dp))
        dp[0, alpha] -= 2 * eps
        Em = float(energy_ewald(lattice, charges, dp))
        fd = -(Ep - Em) / (2 * eps)
        assert abs(fd - float(F[0, alpha])) < 1e-6


def test_symmetric_positions_zero_force():
    lattice = np.array([[0.0, 5.13, 5.13], [5.13, 0.0, 5.13], [5.13, 5.13, 0.0]])
    charges = np.array([4.0, 4.0])
    pos = np.array([[0.125, 0.125, 0.125], [-0.125, -0.125, -0.125]])
    _, F = energy_forces_ewald(lattice, charges, pos)
    assert np.max(np.abs(np.asarray(F))) < 1e-10


def test_eta_independence():
    """The Ewald energy must not depend on the splitting parameter."""
    lattice = np.diag([6.0, 7.0, 8.0])
    charges = np.array([2.0, -1.0, -1.0])
    pos = np.array([[0.1, 0.2, 0.3], [0.4, 0.6, 0.2], [0.7, 0.15, 0.8]])
    E1 = float(energy_ewald(lattice, charges, pos, eta=0.7))
    E2 = float(energy_ewald(lattice, charges, pos, eta=1.1))
    assert abs(E1 - E2) < 1e-9
