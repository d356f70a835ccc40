"""Densities from orbitals; superposition guess densities; symmetrization.

compute_density (DFTK `src/densities.jl:13-57`):
    rho_sigma(r) = sum_{k in sigma} w_k sum_n f_kn |psi_kn(r)|^2
as one batched iFFT + weighted reduction over (k, band); the reduction over
the k axis is a plain sum, which XLA turns into a psum when k is sharded over
the device mesh.

Symmetrization (DFTK `src/symmetry.jl:282-360`) uses precomputed integer
gather maps: rho_sym(G) = 1/|S| sum_s e^{-2 pi i G.tau_s} rho(S_s^{-1} G),
with a low-pass mask dropping G whose orbit leaves the grid.
"""
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as fftops


def compute_density(basis_data, psi, occupation, fft_size, volume, n_spin,
                    symmetrizer=None):
    """rho [nspin, n1, n2, n3] from psi [nk, nb, nG], occupation [nk, nb]."""
    N = int(np.prod(fft_size))
    cube = jax.vmap(
        lambda c, idx, m: fftops.scatter_to_cube(c, idx, m, fft_size)
    )(psi, basis_data.Gidx, basis_data.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1)) * (N / math.sqrt(volume))
    w = basis_data.kweights[:, None] * occupation          # [nk, nb]
    dens_k = jnp.einsum("kn,knxyz->kxyz", w, (psir.conj() * psir).real)

    if n_spin == 1:
        rho = jnp.sum(dens_k, axis=0)[None]
    else:
        sel = jax.nn.one_hot(basis_data.kspin, n_spin, dtype=dens_k.dtype)
        rho = jnp.einsum("ks,kxyz->sxyz", sel, dens_k)

    if symmetrizer is not None:
        rho = symmetrizer(rho)
    return rho


def compute_kinetic_energy_density(basis_data, Gpk_cart, psi, occupation,
                                   fft_size, volume, n_spin):
    """tau [nspin, grid] = 1/2 sum w f |grad psi|^2 (densities.jl:110-125)."""
    N = int(np.prod(fft_size))
    scale = N / math.sqrt(volume)
    w = basis_data.kweights[:, None] * occupation
    tau_k = 0.0
    for a in range(3):
        cube = jax.vmap(
            lambda c, idx, m: fftops.scatter_to_cube(c, idx, m, fft_size)
        )(1j * Gpk_cart[:, None, :, a] * psi, basis_data.Gidx, basis_data.mask)
        dpsir = jnp.fft.ifftn(cube, axes=(-3, -2, -1)) * scale
        tau_k = tau_k + jnp.einsum("kn,knxyz->kxyz", w,
                                   (dpsir.conj() * dpsir).real)
    tau_k = 0.5 * tau_k
    if n_spin == 1:
        return jnp.sum(tau_k, axis=0)[None]
    sel = jax.nn.one_hot(basis_data.kspin, n_spin, dtype=tau_k.dtype)
    return jnp.einsum("ks,kxyz->sxyz", sel, tau_k)


def von_weizsaecker_tau(rho, G_cube_cart):
    """tau_W = |grad rho|^2 / (8 rho): the meta-GGA tau starting guess."""
    rho_G = jnp.fft.fftn(rho, axes=(-3, -2, -1))
    g2 = 0.0
    for a in range(3):
        g = jnp.fft.ifftn(1j * G_cube_cart[..., a] * rho_G,
                          axes=(-3, -2, -1)).real
        g2 = g2 + g * g
    return g2 / (8 * jnp.maximum(rho, 1e-14))


# ---------------------------------------------------------------------------
# Density symmetrization
# ---------------------------------------------------------------------------

class SymmetrizationMaps(NamedTuple):
    idx: Any       # [nsym, N] int32: flat index of S^{-1} G (N if invalid)
    tau: Any       # [nsym, 3] translations
    lowpass: Any   # [N] float mask


def build_symmetrization_maps(basis):
    """Host-side precomputation of the per-symop G gather maps."""
    sym = basis.symmetries
    fft_size = basis.fft_size
    Gred = basis.G_cube.reshape(-1, 3)        # [N, 3]
    N = Gred.shape[0]
    nsym = len(sym)
    idx = np.full((nsym, N), N, dtype=np.int32)
    tau = np.zeros((nsym, 3))
    lowpass = np.ones(N)
    for s, op in enumerate(sym):
        invS = np.rint(np.linalg.inv(op.S)).astype(np.int64)
        src = fftops.index_G_vectors(fft_size, Gred @ invS.T)   # (invS @ G) per row
        idx[s] = np.where(src >= 0, src, N)
        tau[s] = op.tau
        dst = fftops.index_G_vectors(fft_size, Gred @ op.S.T)
        lowpass *= (dst >= 0)
    return SymmetrizationMaps(idx=jnp.asarray(idx), tau=jnp.asarray(tau),
                              lowpass=jnp.asarray(lowpass))


def make_symmetrizer(basis):
    """Returns rho -> symmetrized rho (jit-able closure), or None if trivial."""
    if all(op.is_identity() for op in basis.symmetries):
        return None
    maps = build_symmetrization_maps(basis)
    Gred = jnp.asarray(basis.G_cube.reshape(-1, 3).astype(np.float64))
    fft_size = basis.fft_size
    nsym = maps.idx.shape[0]

    def symmetrize(rho):
        shape = rho.shape
        rho_G = jnp.fft.fftn(rho, axes=(-3, -2, -1)).reshape(shape[0], -1)
        rho_pad = jnp.concatenate(
            [rho_G, jnp.zeros((shape[0], 1), rho_G.dtype)], axis=1)

        def one_op(s):
            phase = jnp.exp(-2j * jnp.pi * (Gred @ maps.tau[s]))
            return phase[None, :] * rho_pad[:, maps.idx[s]]

        acc = jax.lax.map(one_op, jnp.arange(nsym)).sum(axis=0) / nsym
        acc = acc * maps.lowpass[None, :]
        out = jnp.fft.ifftn(acc.reshape(shape), axes=(-3, -2, -1)).real
        return out

    return symmetrize


# ---------------------------------------------------------------------------
# Guess densities (DFTK density_methods.jl: Gaussian superposition)
# ---------------------------------------------------------------------------

def guess_density(basis, magnetic_moments=None, n_electrons=None):
    """Superposition of atomic (Gaussian) valence densities, renormalised.

    Returns rho [nspin, n1, n2, n3] (numpy -> jnp array).
    """
    from ..models.elements import atom_decay_length
    model = basis.model
    if n_electrons is None:
        n_electrons = model.n_electrons
    nspin = model.n_spin_components

    rho_tot = _gaussian_superposition(basis, [1.0] * len(model.atoms))

    if nspin == 1:
        rho = rho_tot[None]
    else:
        if magnetic_moments is None or len(magnetic_moments) == 0:
            rho_spin = np.zeros_like(rho_tot)
        else:
            coeffs = []
            for at, m in zip(model.atoms, magnetic_moments):
                mz = float(np.atleast_1d(m)[-1])
                nval = at.n_elec_valence()
                assert abs(mz) <= nval, "magnetic moment too large"
                coeffs.append(mz / nval)
            rho_spin = _gaussian_superposition(basis, coeffs)
        rho = np.stack([(rho_tot + rho_spin) / 2, (rho_tot - rho_spin) / 2])

    Ncur = rho.sum() * basis.dvol
    if Ncur > 0 and n_electrons is not None:
        rho = rho * (n_electrons / Ncur)
    return jnp.asarray(rho)


def _gaussian_superposition(basis, coefficients):
    from ..models.elements import atom_decay_length
    model = basis.model
    Gnorm = basis.G_cube_cart_norm.reshape(-1)
    Gred = basis.G_cube.reshape(-1, 3).astype(float)
    rho_G = np.zeros(Gnorm.shape, dtype=np.complex128)
    ff_cache = {}
    for i, at in enumerate(model.atoms):
        if coefficients[i] == 0:
            continue
        if at not in ff_cache:
            if at.has_valence_density():
                ff_cache[at] = np.asarray(at.valence_density_fourier(Gnorm))
            else:
                decay = atom_decay_length(at)
                ff_cache[at] = at.charge_ionic() * np.exp(-((Gnorm * decay) ** 2))
        phase = np.exp(-2j * math.pi * (Gred @ np.asarray(model.positions[i])))
        rho_G += coefficients[i] * ff_cache[at] * phase
    rho_G /= math.sqrt(model.unit_cell_volume)
    cube = rho_G.reshape(basis.fft_size)
    N = np.prod(basis.fft_size)
    rho = np.fft.ifftn(cube).real * (N / math.sqrt(model.unit_cell_volume))
    return rho


def random_density(basis, seed=0, n_electrons=None):
    """Random positive density normalised to n_electrons.

    The reference's RandomDensity guess method (density_methods.jl) —
    mostly useful to test SCF robustness against bad starting points.
    """
    model = basis.model
    if n_electrons is None:
        n_electrons = model.n_electrons
    nspin = model.n_spin_components
    rng = np.random.default_rng(seed)
    rho = rng.random((nspin,) + tuple(basis.fft_size))
    rho *= n_electrons / (rho.sum() * basis.dvol)
    return jnp.asarray(rho)


def total_density(rho):
    return jnp.sum(rho, axis=0)


def spin_density(rho):
    if rho.shape[0] == 1:
        return jnp.zeros_like(rho[0])
    return rho[0] - rho[1]
