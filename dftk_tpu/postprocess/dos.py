"""Density of states: total, local and projected.

Mirrors DFTK `src/postprocess/dos.jl:18-118`:
  DOS(eps)  = sum_kn w_k (-f'((eps_kn - eps)/T)) / T * filled
  LDOS(eps, r) = same sum weighted by |psi_kn(r)|^2
PDOS requires atomic pseudo-orbitals (UPF); HGH psps carry none, so PDOS is
available once UPF support lands.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..models.smearing import Gaussian


def compute_dos(eps, basis, eigenvalues, smearing=None, temperature=None):
    """Total DOS at energies eps (scalar or array) per unit cell."""
    model = basis.model
    if temperature is None:
        temperature = model.temperature if model.temperature > 0 else 1e-3
    if smearing is None:
        smearing = model.smearing if model.temperature > 0 else Gaussian()
    filled = model.filled_occupation
    eps = jnp.atleast_1d(jnp.asarray(eps))
    ev = jnp.asarray(eigenvalues)                       # [nk, nb]
    w = jnp.asarray(basis.kweights)

    x = (ev[None, :, :] - eps[:, None, None]) / temperature

    docc = jax.vmap(jax.vmap(jax.vmap(
        jax.grad(lambda t: smearing.occupation(t)))))(x)
    dos = -filled / temperature * jnp.einsum("k,ekn->e", w, docc)
    return np.asarray(dos)


def compute_ldos(eps, basis, eigenvalues, psi, smearing=None, temperature=None):
    """Local DOS on the real-space grid, [n_eps, n1, n2, n3] (spin-summed)."""
    from ..ops import fft as fftops
    model = basis.model
    if temperature is None:
        temperature = model.temperature if model.temperature > 0 else 1e-3
    if smearing is None:
        smearing = model.smearing if model.temperature > 0 else Gaussian()
    filled = model.filled_occupation
    eps = jnp.atleast_1d(jnp.asarray(eps))
    ev = jnp.asarray(eigenvalues)
    bd = basis.data
    N = int(np.prod(basis.fft_size))
    vol = model.unit_cell_volume

    cube = jax.vmap(lambda c, idx, m: fftops.scatter_to_cube(
        c, idx, m, basis.fft_size))(psi, bd.Gidx, bd.mask)
    psir2 = jnp.abs(jnp.fft.ifftn(cube, axes=(-3, -2, -1))
                    * (N / np.sqrt(vol))) ** 2            # [nk, nb, grid]

    x = (ev[None, :, :] - eps[:, None, None]) / temperature
    docc = jax.vmap(jax.vmap(jax.vmap(
        jax.grad(lambda t: smearing.occupation(t)))))(x)   # [ne, nk, nb]
    weights = -filled / temperature * docc * bd.kweights[None, :, None]
    ldos = jnp.einsum("ekn,knxyz->exyz", weights, psir2)
    return np.asarray(ldos)


def plot_dos_data(basis, eigenvalues, n_points=200, margin=0.1, **kwargs):
    """Convenience: energy grid + DOS values spanning the eigenvalue range."""
    lo = float(np.min(eigenvalues)) - margin
    hi = float(np.max(eigenvalues)) + margin
    eps = np.linspace(lo, hi, n_points)
    return eps, compute_dos(eps, basis, eigenvalues, **kwargs)
