"""Transfer of Bloch waves and densities between plane-wave bases.

Mirrors DFTK `src/transfer.jl` / `src/interpolation.jl`: because both bases
index their spheres by integer G vectors, transfer is a gather with zero
fill for G outside the source sphere - exact when growing the basis
(Ecut_out >= Ecut_in), a spectral truncation otherwise.  Densities transfer
through the Fourier cube the same way.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .ops import fft as fftops


def transfer_mapping(basis_in, basis_out):
    """For each (k, G_out) the padded index into the k-sphere of basis_in.

    Returns (idx [nk, nG_out] int32 pointing into nG_in (nG_in = missing),
             valid [nk, nG_out]).
    Requires identical k-point lists.
    """
    assert basis_in.n_kpoints == basis_out.n_kpoints
    nk = basis_in.n_kpoints
    nG_in = basis_in.nG_max
    idx = np.full((nk, basis_out.nG_max), nG_in, dtype=np.int32)
    for ik in range(nk):
        # map integer G -> position in the input sphere
        lut = {}
        for j in range(int(basis_in.nG_per_k[ik])):
            lut[tuple(basis_in.Gred_np[ik, j])] = j
        for j in range(int(basis_out.nG_per_k[ik])):
            src = lut.get(tuple(basis_out.Gred_np[ik, j]))
            if src is not None:
                idx[ik, j] = src
    valid = (idx < nG_in).astype(np.float64)
    return jnp.asarray(idx), jnp.asarray(valid)


def transfer_blochwave(psi, basis_in, basis_out):
    """psi [nk, nb, nG_in] -> [nk, nb, nG_out] (zero-padded / truncated)."""
    idx, valid = transfer_mapping(basis_in, basis_out)
    psi_pad = jnp.concatenate(
        [psi, jnp.zeros(psi.shape[:2] + (1,), psi.dtype)], axis=-1)
    out = jax.vmap(lambda p, i: p[:, i])(psi_pad, idx)
    return out * valid[:, None, :]


def transfer_density(rho, basis_in, basis_out):
    """Fourier-space transfer of a density between real-space grids."""
    rho_G = jnp.fft.fftn(rho, axes=(-3, -2, -1))
    Gs_in = basis_in.G_cube.reshape(-1, 3)
    idx_out = fftops.index_G_vectors(basis_out.fft_size, Gs_in)
    N_out = int(np.prod(basis_out.fft_size))
    out_flat = jnp.zeros(rho.shape[:-3] + (N_out,), dtype=rho_G.dtype)
    sel = idx_out >= 0
    src = rho_G.reshape(rho.shape[:-3] + (-1,))[..., jnp.asarray(np.nonzero(sel)[0])]
    out_flat = out_flat.at[..., jnp.asarray(idx_out[sel])].set(src)
    scale = N_out / np.prod(basis_in.fft_size)
    out = jnp.fft.ifftn(out_flat.reshape(rho.shape[:-3] + basis_out.fft_size),
                        axes=(-3, -2, -1)).real * scale
    return out


def interpolate_kpoint(psi_k, basis_in, ik_in, basis_out, ik_out):
    """Transfer one k-point's orbitals between (possibly different) k-points.

    Used for band-structure warm starts; G vectors matched by integer value.
    """
    lut = {}
    for j in range(int(basis_in.nG_per_k[ik_in])):
        lut[tuple(basis_in.Gred_np[ik_in, j])] = j
    nb = psi_k.shape[0]
    out = np.zeros((nb, basis_out.nG_max), dtype=np.asarray(psi_k).dtype)
    psi_np = np.asarray(psi_k)
    for j in range(int(basis_out.nG_per_k[ik_out])):
        src = lut.get(tuple(basis_out.Gred_np[ik_out, j]))
        if src is not None:
            out[:, j] = psi_np[:, src]
    return jnp.asarray(out)
