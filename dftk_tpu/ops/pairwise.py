"""Classical pairwise interatomic potentials (reference terms/pairwise.jl).

Energy per unit cell of  1/2 sum_{i,j,R}' V_{sp(i),sp(j)}(|r_i - r_j - R|)
with a real-space cutoff; differentiable jnp lattice sum, so forces come
from jax.grad like the Ewald term.

V is called with the SQUARED Cartesian distance (keeps autodiff smooth) and
the per-pair parameter object: V(d2, params[(symA, symB)]).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.lattice import estimate_integer_lattice_bounds


def _species(at):
    return getattr(at, "symbol", str(type(at).__name__))


def energy_pairwise(lattice, atoms, positions, V, params, max_radius=100.0):
    lattice_host = np.asarray(jax.lax.stop_gradient(lattice), dtype=float)
    Rlims = estimate_integer_lattice_bounds(lattice_host, max_radius)
    axes = [np.arange(-l, l + 1) for l in Rlims]
    Rbox = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)

    lattice = jnp.asarray(lattice)
    positions = jnp.asarray(positions)
    na = positions.shape[0]
    syms = [_species(at) for at in atoms]

    diff = positions[:, None, :] - positions[None, :, :]
    disp = diff[None] - jnp.asarray(Rbox, lattice.dtype)[:, None, None, :]
    dcart = jnp.einsum("ab,rijb->rija", lattice, disp)
    d2 = jnp.sum(dcart * dcart, axis=-1)
    self_pair = (jnp.all(jnp.asarray(Rbox) == 0, axis=1)[:, None, None]
                 & jnp.eye(na, dtype=bool)[None])
    cutoff = (d2 <= max_radius ** 2) & jnp.logical_not(self_pair)

    E = 0.0
    for i in range(na):
        for j in range(na):
            key = tuple(sorted((syms[i], syms[j])))
            if key not in params:
                continue
            vij = V(jnp.where(cutoff[:, i, j], d2[:, i, j], 1.0), params[key])
            E = E + jnp.sum(jnp.where(cutoff[:, i, j], vij, 0.0))
    return E / 2


def energy_forces_pairwise(lattice, atoms, positions, V, params,
                           max_radius=100.0):
    """Energy and forces (reduced coords) of the pairwise term."""
    positions = jnp.asarray(positions, dtype=jnp.float64)
    E, g = jax.value_and_grad(
        lambda pos: energy_pairwise(lattice, atoms, pos, V, params,
                                    max_radius))(positions)
    return E, -g


def lennard_jones(d2, params):
    """V = 4 eps [(sigma^2/d2)^6 - (sigma^2/d2)^3]; params = (eps, sigma)."""
    eps, sigma = params
    s6 = (sigma ** 2 / d2) ** 3
    return 4 * eps * (s6 * s6 - s6)
