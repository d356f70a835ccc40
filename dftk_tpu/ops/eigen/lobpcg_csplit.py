"""Batched LOBPCG over COMPLEX bands stored as realified vectors.

Same scheme as ops/eigen/lobpcg.py (canonical-orthogonalisation deflation,
implicit product updates, soft locking, best-iterate return - the TPU
redesign of DFTK's lobpcg_hyper, eigen/lobpcg_hyper_impl.jl), but the
subspace algebra respects the complex structure of realified vectors
u = (x; y) via ops/eigen/csplit.py: complex Grams, complex CholQR through
the interleaved embedding, complex Rayleigh-Ritz through the stacked
embedding.

Why it exists: the plain real LOBPCG on the realified doubled space costs
TWO H-applies per physical band (spectrum pairing).  This solver iterates
nb complex bands directly - ONE apply per band - while every device op
stays real (f32-only TPU backends).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .csplit import (cgram, crotate, ortho_qr_csplit, rr_whiten_csplit)
from .lobpcg import LobpcgResult


def lobpcg_csplit(apply_A: Callable, X0, kin2, mask2, tol=1e-6, maxiter=100,
                  n_conv: Optional[int] = None,
                  refresh_products: Optional[bool] = None):
    """Lowest-nb eigenpairs of Hermitian apply_A on realified complex bands.

    apply_A: [nk, nb, 2nG] -> [nk, nb, 2nG] (realified complex-linear H)
    X0:      [nk, nb, 2nG] initial realified bands (masked)
    kin2:    [nk, 2nG] duplicated kinetic energies (TPA preconditioner)
    mask2:   [nk, 2nG] duplicated validity mask
    """
    nk, nb, twoG = X0.shape
    if n_conv is None:
        n_conv = nb
    dtype = X0.dtype
    gram_eps = float(jnp.finfo(dtype).eps)
    # pair-splitting perturbation for the final reduced eigh (see
    # csplit.ceigh_pairs); the Gram itself is whitened by embedded
    # Cholesky (rr_whiten_csplit), which has no pair-selection step
    pert = 3e3 * gram_eps
    if refresh_products is None:
        refresh_products = gram_eps > 1e-12

    def inner_diag(A, B):
        return jnp.einsum("kng,kng->kn", A, B)

    X = ortho_qr_csplit(X0 * mask2[:, None, :])
    AX = apply_A(X)

    def precond(X, R):
        mean_kin = jnp.einsum("kng,kg,kng->kn", X, kin2, X)
        mean_kin = jnp.maximum(mean_kin, 1e-12)
        return R * (mean_kin[:, :, None]
                    / (mean_kin[:, :, None] + kin2[:, None, :] + 1e-20))

    def rayleigh_ritz(S, AS):
        Or, Oi = cgram(S, S)
        Hr, Hi = cgram(S, AS)
        theta, (Cr, Ci) = rr_whiten_csplit(Or, Oi, Hr, Hi, pert)
        return theta[..., :nb], (Cr[..., :nb], Ci[..., :nb])

    def project_out(Y, X):
        Gr, Gi = cgram(X, Y)
        return Y - crotate(Gr, Gi, X)

    def row_normalize(Y):
        n = jnp.linalg.norm(Y, axis=-1, keepdims=True)
        return Y / jnp.maximum(n, 1e-30)

    def step(state):
        (X, AX, P, AP, lam, res, it, nmv, _, best, no_improve,
         Xb, lamb, resb) = state
        if refresh_products:
            X = ortho_qr_csplit(X)
            AX = apply_A(X)
            lam = inner_diag(X, AX)
        R = AX - lam[:, :, None].astype(dtype) * X
        res = jnp.linalg.norm(R, axis=-1)
        W = precond(X, R) * mask2[:, None, :]
        noise_floor = jnp.maximum(0.1 * tol,
                                  30 * gram_eps * (1.0 + jnp.abs(lam)))
        active = (res > noise_floor)[:, :, None]
        W = W * active
        W = row_normalize(project_out(W, X)) * active
        AW = apply_A(W)
        gXPr, gXPi = cgram(X, P)
        P1 = P - crotate(gXPr, gXPi, X)
        AP1 = AP - crotate(gXPr, gXPi, AX)
        gWPr, gWPi = cgram(W, P1)
        P2 = P1 - crotate(gWPr, gWPi, W)
        AP2 = AP1 - crotate(gWPr, gWPi, AW)
        pn = jnp.maximum(jnp.linalg.norm(P2, axis=-1, keepdims=True), 1e-30)
        P, AP = P2 / pn, AP2 / pn

        S = jnp.concatenate([X, W, P], axis=1)
        AS = jnp.concatenate([AX, AW, AP], axis=1)
        lam_new, (cr, ci) = rayleigh_ritz(S, AS)

        Xn = crotate(cr, ci, S)
        AXn = crotate(cr, ci, AS)
        # exact Rayleigh quotients: ceigh's pair-splitting ramp biases the
        # Ritz values by up to ~1e4 eps |H|, which would pollute the
        # residual-based convergence gating at f32
        lam_new = jnp.einsum("kng,kng->kn", Xn, AXn)
        cr_p = cr.at[:, :nb, :].set(0)
        ci_p = ci.at[:, :nb, :].set(0)
        Pn = crotate(cr_p, ci_p, S)
        APn = crotate(cr_p, ci_p, AS)

        ok = jnp.all(jnp.isfinite(lam_new))
        keep = lambda new, old: jnp.where(ok, new, old)
        cur = jnp.max(res[:, :n_conv])
        improved = cur < best
        best_new = jnp.minimum(best, cur)
        no_improve_new = jnp.where(cur < 0.99 * best, 0, no_improve + 1)
        Xb_new = jnp.where(improved, X, Xb)
        lamb_new = jnp.where(improved, lam, lamb)
        resb_new = jnp.where(improved, res, resb)
        stalled = (jnp.logical_not(jnp.any(active))
                   | jnp.logical_not(ok)
                   | (no_improve_new >= 6))
        nmv_step = nk * nb * (2 if refresh_products else 1)
        return (keep(Xn, X), keep(AXn, AX), keep(Pn, P), keep(APn, AP),
                keep(lam_new, lam), res, it + 1, nmv + nmv_step, stalled,
                best_new, no_improve_new, Xb_new, lamb_new, resb_new)

    def cond(state):
        res, it, stalled = state[5], state[6], state[8]
        not_conv = jnp.max(res[:, :n_conv]) >= tol
        keep_going = jnp.logical_and(it < maxiter,
                                     jnp.logical_or(it < 1, not_conv))
        return jnp.logical_and(keep_going, jnp.logical_not(stalled))

    lam0 = inner_diag(X, AX)
    res0 = jnp.full((nk, nb), jnp.inf)
    state0 = (X, AX, jnp.zeros_like(X), jnp.zeros_like(X), lam0,
              res0, jnp.asarray(0), jnp.asarray(nk * nb),
              jnp.asarray(False), jnp.asarray(jnp.inf), jnp.asarray(0),
              X, lam0, res0)
    (X, AX, P, AP, lam, res, it, nmv, _, _, _, Xb, lamb, resb) = \
        jax.lax.while_loop(cond, step, state0)

    use_last = jnp.max(res[:, :n_conv]) <= jnp.max(resb[:, :n_conv])
    Xf = jnp.where(use_last, X, Xb)
    Xf = ortho_qr_csplit(Xf)
    AXf = apply_A(Xf)
    lamf = inner_diag(Xf, AXf)
    Rf = AXf - lamf[:, :, None].astype(dtype) * Xf
    resf = jnp.linalg.norm(Rf, axis=-1)
    converged = jnp.max(resf[:, :n_conv]) < tol
    return LobpcgResult(X=Xf, eigenvalues=lamf, residual_norms=resf,
                        n_iter=it, n_matvec=nmv + nk * nb, converged=converged)
