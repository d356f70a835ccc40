"""Anyonic term: 2D anyons with a density-dependent gauge field.

Counterpart of the reference `src/terms/anyonic.jl` (average-field anyon
model): electrons couple to the self-consistent vector potential

    A[rho](r) = beta * grad^perp (Delta^{-1} rho)(r)
    (Fourier: A_hat = beta * i (-G_y, G_x, 0) / |G|^2 * rho_hat)

giving the magnetic-like Hamiltonian  1/2 |(-i grad + A)|^2 contributions:
the cross term A.(-i grad) plus the diagonal |A|^2/2.  2D systems only
(the z lattice direction is a spectator); experimental parity feature.
"""
import jax
import jax.numpy as jnp
import numpy as np


def gauge_field(rho_tot, G_cube_cart, beta):
    """A[rho] [n1,n2,n3,2] (x,y components) from the total density."""
    Gx = G_cube_cart[..., 0]
    Gy = G_cube_cart[..., 1]
    Gsq = Gx * Gx + Gy * Gy
    rho_G = jnp.fft.fftn(rho_tot)
    inv = jnp.where(Gsq > 0, 1.0 / jnp.where(Gsq > 0, Gsq, 1.0), 0.0)
    phi_G = rho_G * inv
    Ax = jnp.fft.ifftn(1j * (-Gy) * phi_G).real * beta
    Ay = jnp.fft.ifftn(1j * Gx * phi_G).real * beta
    return jnp.stack([Ax, Ay], axis=-1)


def anyonic_potentials(rho, G_cube_cart, beta):
    """(Apot [n1,n2,n3,3], V_diag = |A|^2/2) for the Hamiltonian."""
    A2 = gauge_field(jnp.sum(rho, axis=0), G_cube_cart, beta)
    Apot = jnp.concatenate([A2, jnp.zeros_like(A2[..., :1])], axis=-1)
    Vdiag = 0.5 * jnp.sum(A2 * A2, axis=-1)
    return Apot, Vdiag
