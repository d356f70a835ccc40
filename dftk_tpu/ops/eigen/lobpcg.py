"""Batched LOBPCG block eigensolver, vmapped over k-points.

TPU-native redesign of DFTK's `lobpcg_hyper` (eigen/lobpcg_hyper_impl.jl):
all k-points iterate together as one batched [nk, nb, nG] problem with fixed
shapes (lax.while_loop), so the whole solve is a single XLA program of
batched GEMMs + H applies - no per-k Python loop, no ragged shapes.

Robustness scheme (replacing the reference's Cholesky-with-retries,
lobpcg_hyper_impl.jl:1-45): the [X | W | P] subspace is orthonormalised by
*canonical orthogonalisation* - eigendecomposition of the Gram matrix with
relative-threshold filtering - and rank-deficient directions are deflated by
a large diagonal shift in the reduced Rayleigh-Ritz problem.  This keeps all
shapes static (deflation instead of column dropping) and is unconditionally
stable; the small (3 nb)^2 dense work runs in f64.

Matvec economy matches the reference: one H apply per iteration on the nb
new directions (X / P updates reuse A S through the subspace rotation -
"implicit product updates").
"""
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

_DEFLATION_SHIFT = 1e8
_GRAM_RTOL = 1e-14


class LobpcgResult(NamedTuple):
    X: jnp.ndarray              # [nk, nb, nG] eigenvectors
    eigenvalues: jnp.ndarray    # [nk, nb]
    residual_norms: jnp.ndarray  # [nk, nb]
    n_iter: jnp.ndarray         # scalar
    n_matvec: jnp.ndarray       # scalar    (counts band-vectors applied)
    converged: jnp.ndarray      # scalar bool


def _inner(a, b):
    """<a_i | b_j> over the G axis: [nk, na, nG] x [nk, nb, nG] -> [nk, na, nb]."""
    return jnp.einsum("kag,kbg->kab", a.conj(), b)


def _rotate(coeff, S):
    """X_j = sum_a coeff[a, j] S_a : [nk, 3nb, nb] x [nk, 3nb, nG] -> [nk, nb, nG]."""
    return jnp.einsum("kaj,kag->kjg", coeff, S)


def ortho_qr(X):
    """B-orthonormalise the rows of X via Cholesky of the Gram matrix."""
    O = _inner(X, X)
    eps = 1e-14 * jnp.real(jnp.trace(O, axis1=-2, axis2=-1))[:, None, None]
    L = jnp.linalg.cholesky(O + eps * jnp.eye(O.shape[-1], dtype=O.dtype))
    return jax.lax.linalg.triangular_solve(
        L, X, left_side=True, lower=True, conjugate_a=False)


def lobpcg(apply_A: Callable, X0, kin, mask, tol=1e-6, maxiter=100,
           n_conv: Optional[int] = None, tpa_shift=1.0):
    """Find the lowest-nb eigenpairs of the Hermitian operator apply_A.

    apply_A: [nk, nb, nG] -> [nk, nb, nG]
    X0:      [nk, nb, nG] initial guess (assumed masked; need not be orthonormal)
    kin:     [nk, nG] kinetic energies (TPA preconditioner diagonal)
    mask:    [nk, nG] 1/0 validity
    n_conv:  number of lowest bands whose residuals gate convergence
    """
    nk, nb, nG = X0.shape
    if n_conv is None:
        n_conv = nb
    cdtype = X0.dtype

    X = ortho_qr(X0 * mask[:, None, :])
    AX = apply_A(X)

    def precond(X, R):
        # Teter-Payne-Allan: R_n * t_n / (t_n + kin), t_n = <X_n|kin|X_n>
        mean_kin = jnp.einsum("kng,kg,kng->kn", X.conj(), kin, X).real
        mean_kin = jnp.maximum(mean_kin, 1e-12)
        return R * (mean_kin[:, :, None]
                    / (mean_kin[:, :, None] + kin[:, None, :] + 1e-20))

    def rayleigh_ritz(S, AS):
        O = _inner(S, S)
        s, U = jnp.linalg.eigh(O)
        smax = s[..., -1:]
        good = s > _GRAM_RTOL * jnp.maximum(smax, 1e-300)
        scale = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, s, 1.0)), 0.0)
        C = U * scale[:, None, :]                      # [nk, 3nb, 3nb]
        Hred = _inner(S, AS)
        Ht = C.conj().transpose(0, 2, 1) @ Hred @ C
        Ht = Ht + jnp.where(good, 0.0, _DEFLATION_SHIFT)[:, None, :] \
            * jnp.eye(Ht.shape[-1], dtype=Ht.dtype)
        # hermitize for eigh stability
        Ht = (Ht + Ht.conj().transpose(0, 2, 1)) / 2
        theta, Y = jnp.linalg.eigh(Ht)
        coeff = C @ Y[..., :nb]                        # [nk, 3nb, nb]
        return theta[..., :nb].real, coeff

    def step(state):
        X, AX, P, AP, lam, res, it, nmv, _ = state
        R = AX - lam[:, :, None].astype(cdtype) * X
        res = jnp.linalg.norm(R, axis=-1)
        W = precond(X, R) * mask[:, None, :]
        AW = apply_A(W)

        S = jnp.concatenate([X, W, P], axis=1)
        AS = jnp.concatenate([AX, AW, AP], axis=1)
        lam_new, coeff = rayleigh_ritz(S, AS)

        Xn = _rotate(coeff, S)
        AXn = _rotate(coeff, AS)
        # new search directions: the W/P part of the update only
        coeff_p = coeff.at[:, :nb, :].set(0)
        Pn = _rotate(coeff_p, S)
        APn = _rotate(coeff_p, AS)
        return (Xn, AXn, Pn, APn, lam_new, res, it + 1, nmv + nk * nb,
                jnp.asarray(False))

    def cond(state):
        _, _, _, _, _, res, it, _, _ = state
        not_conv = jnp.max(res[:, :n_conv]) >= tol
        return jnp.logical_and(it < maxiter, jnp.logical_or(it < 1, not_conv))

    lam0 = jnp.real(jnp.einsum("kng,kng->kn", X.conj(), AX))
    state0 = (X, AX, jnp.zeros_like(X), jnp.zeros_like(X), lam0,
              jnp.full((nk, nb), jnp.inf), jnp.asarray(0), jnp.asarray(nk * nb),
              jnp.asarray(False))
    X, AX, P, AP, lam, res, it, nmv, _ = jax.lax.while_loop(cond, step, state0)

    # final residuals for the returned vectors
    R = AX - lam[:, :, None].astype(cdtype) * X
    res = jnp.linalg.norm(R, axis=-1)
    converged = jnp.max(res[:, :n_conv]) < tol
    return LobpcgResult(X=X, eigenvalues=lam, residual_norms=res,
                        n_iter=it, n_matvec=nmv, converged=converged)
