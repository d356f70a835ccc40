"""Dense diagonalization fallback (DFTK `src/eigen/diag_full.jl`).

Materialises the Hamiltonian as a [nk, nG, nG] matrix by applying it to the
identity and calls batched eigh.  Only for small problems / testing; padded
basis entries get a huge diagonal so they sort to the top end.
"""
import jax
import jax.numpy as jnp

_PAD_SHIFT = 1e6


def diag_full(apply_A, nk, nG, mask, n_bands, dtype=jnp.complex128):
    """Lowest n_bands eigenpairs of the operator, per k-point."""
    eye = jnp.eye(nG, dtype=dtype)
    basis_vecs = jnp.broadcast_to(eye, (nk, nG, nG)) * mask[:, :, None]
    cols = apply_A(basis_vecs)           # cols[k, n, G] = (H e_n)_G = H[G, n]
    H = jnp.swapaxes(cols, 1, 2)         # [nk, G, n] -> proper matrix
    H = (H + H.conj().swapaxes(1, 2)) / 2
    pad = (1.0 - mask) * _PAD_SHIFT
    H = H + jax.vmap(jnp.diag)(pad).astype(H.dtype)
    w, v = jnp.linalg.eigh(H)
    X = jnp.swapaxes(v[:, :, :n_bands], 1, 2)   # [nk, nb, nG]
    return w[:, :n_bands], X * mask[:, None, :]
