"""Adaptively Compressed Exchange (ACE) for hybrid-functional SCF.

Lin Lin, JCTC 12, 2242 (2016).  The Fock operator applied during the inner
eigensolver loop is replaced by its low-rank compression

    V_ACE = - sum_m |xi_m><xi_m|,   Xi = conj(L^{-1}) W,   L L^H = -Psi^H W,
    W_m = Vx psi_m,

which agrees with Vx EXACTLY on span(Psi) and is negative semidefinite
everywhere.  One full exchange application per SCF step (building W)
replaces one per eigensolver matvec - the standard trick that makes
hybrids affordable (the reference applies the bare operator on every
matvec, terms/exact_exchange.jl; ACE is the TPU-friendly upgrade: the
compressed apply is two GEMMs on the MXU).
"""
import jax.numpy as jnp

from . import hamiltonian as hamops


def build_ace(ham, fft_size, volume, jitter=1e-12):
    """Xi [nk, n_x, nG] from a Ham whose exx_* fields are set."""
    psi = ham.exx_psi
    W = hamops._apply_exchange(ham, psi, fft_size, volume)    # Vx psi
    M = jnp.einsum("kig,kjg->kij", psi.conj(), W)
    M = (M + M.conj().swapaxes(1, 2)) / 2                     # [nk, nx, nx]
    nx = M.shape[-1]
    # -M is PSD (Coulomb kernel >= 0); jitter guards zero-occupation rows
    tr = jnp.clip(-jnp.trace(M, axis1=1, axis2=2).real, 1.0, None)
    A = -M + (jitter * tr)[:, None, None] * jnp.eye(nx, dtype=M.dtype)
    L = jnp.linalg.cholesky(A)
    # requirement (V_ACE Psi = W)  <=>  C^H C = -(M^T)^{-1} for Xi = C W,
    # solved by C = conj(L)^{-1}:  Xi = conj(L^{-1} conj(W))
    return jnp.conj(jnp.linalg.solve(L, jnp.conj(W)))


def apply_ace(xi, phi):
    """(V_ACE phi) = - xi (xi^H phi):  two GEMMs per k."""
    c = jnp.einsum("kmg,kng->knm", xi.conj(), phi)
    return -jnp.einsum("kmg,knm->kng", xi, c)
