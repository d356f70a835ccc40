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


def ortho_qr(X, passes=2):
    """Orthonormalise the rows of X (CholeskyQR2).

    One Cholesky pass orthogonalises only up to kappa(X)^2 * eps; a second
    pass fixes that for any kappa below ~1/sqrt(eps) (the reference applies
    the same double-Cholesky scheme, lobpcg_hyper_impl.jl:12-18).
    """
    meps = float(jnp.finfo(X.real.dtype).eps)
    for _ in range(passes):
        O = _inner(X, X)
        eps = 10 * meps * jnp.real(
            jnp.trace(O, axis1=-2, axis2=-1))[:, None, None]
        L = jnp.linalg.cholesky(O + eps * jnp.eye(O.shape[-1], dtype=O.dtype))
        # G[a,b] = <X_a|X_b> = L L^H  =>  rows orthonormalise via conj(L)^-1 X
        X = jax.lax.linalg.triangular_solve(
            L, X, left_side=True, lower=True, conjugate_a=True)
        # if Cholesky failed (rank collapse -> NaN), fall back to canonical
        # orthogonalisation of the same block
        bad = jnp.any(jnp.isnan(X))
        X = jnp.where(bad, _ortho_canonical_rows(_nan_to_zero(X)), X)
    return X


def _nan_to_zero(X):
    return jnp.where(jnp.isnan(X), 0.0, X)


def _ortho_canonical_rows(X):
    O = _inner(X, X)
    s, U = jnp.linalg.eigh(O)
    smax = s[..., -1:]
    good = s > 1e-10 * jnp.maximum(smax, 1e-300)
    scale = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, s, 1.0)), 0.0)
    C = U * scale[:, None, :]
    return jnp.einsum("kab,kag->kbg", C.conj(), X)


def lobpcg(apply_A: Callable, X0, kin, mask, tol=1e-6, maxiter=100,
           n_conv: Optional[int] = None, tpa_shift=1.0,
           refresh_products: Optional[bool] = None):
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
    # rank-filter threshold for the canonical orthogonalisation, scaled to
    # the working precision (f32 needs a much larger cutoff than f64)
    gram_eps = float(jnp.finfo(jnp.zeros((), dtype=X0.dtype).real.dtype).eps)
    gram_rtol = 300 * gram_eps
    if refresh_products is None:
        # implicit product updates (reusing A S through the subspace rotation)
        # drift too fast at f32; recompute A X each iteration there
        refresh_products = gram_eps > 1e-12

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
        good = s > gram_rtol * jnp.maximum(smax, 1e-300)
        scale = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, s, 1.0)), 0.0)
        C = U * scale[:, None, :]                      # [nk, 3nb, 3nb]
        Hred = _inner(S, AS)
        Ht = C.conj().transpose(0, 2, 1) @ Hred @ C
        # deflate rank-deficient directions: their rows/cols are exactly zero
        # (scale=0), so a diagonal shift just above the spectrum decouples
        # them exactly; keep the shift moderate - a huge constant would
        # perturb the good eigenvalues by shift*eps in low precision
        dmax = jnp.max(jnp.abs(jnp.diagonal(Ht, axis1=-2, axis2=-1)),
                       axis=-1, keepdims=True)
        shift = (2 * dmax + 10.0)[..., None]
        Ht = Ht + jnp.where(good, 0.0, shift[..., 0])[:, None, :] \
            * jnp.eye(Ht.shape[-1], dtype=Ht.dtype)
        # hermitize for eigh stability
        Ht = (Ht + Ht.conj().transpose(0, 2, 1)) / 2
        theta, Y = jnp.linalg.eigh(Ht)
        coeff = C @ Y[..., :nb]                        # [nk, 3nb, nb]
        return theta[..., :nb].real, coeff

    def project_out(Y, X):
        """Remove the X components of the rows of Y (keeps Gram well-
        conditioned; mirrors the reference's ortho!(W, X) step)."""
        return Y - jnp.einsum("kab,kag->kbg", _inner(X, Y), X)

    def row_normalize(Y):
        n = jnp.linalg.norm(Y, axis=-1, keepdims=True)
        return Y / jnp.maximum(n, 1e-30)

    def step(state):
        (X, AX, P, AP, lam, res, it, nmv, _, best, no_improve,
         Xb, lamb, resb) = state
        if refresh_products:
            # re-orthonormalise and recompute products: immune to the
            # rotation-drift that breaks implicit updates at f32
            X = ortho_qr(X)
            AX = apply_A(X)
            lam = jnp.real(jnp.einsum("kng,kng->kn", X.conj(), AX))
        R = AX - lam[:, :, None].astype(cdtype) * X
        res = jnp.linalg.norm(R, axis=-1)
        W = precond(X, R) * mask[:, None, :]
        # soft locking: residuals at the round-off noise floor carry no
        # information - feeding them to the subspace (after normalisation!)
        # amplifies noise and breaks the variational bound; zero them so the
        # Gram filter deflates those directions
        noise_floor = jnp.maximum(0.1 * tol,
                                  30 * gram_eps * (1.0 + jnp.abs(lam)))
        active = (res > noise_floor)[:, :, None]
        W = W * active
        # pre-orthogonalise the new directions against X (and W for P) so
        # the subspace Gram matrix stays well-conditioned - essential at f32
        W = row_normalize(project_out(W, X)) * active
        AW = apply_A(W)
        # project P against X and W *as a linear map*, applying the same
        # combination to AP so (P, AP) stay consistent (A is linear)
        cXP = _inner(X, P)
        P1 = P - jnp.einsum("kab,kag->kbg", cXP, X)
        AP1 = AP - jnp.einsum("kab,kag->kbg", cXP, AX)
        cWP = _inner(W, P1)
        P2 = P1 - jnp.einsum("kab,kag->kbg", cWP, W)
        AP2 = AP1 - jnp.einsum("kab,kag->kbg", cWP, AW)
        pn = jnp.maximum(jnp.linalg.norm(P2, axis=-1, keepdims=True), 1e-30)
        P, AP = P2 / pn, AP2 / pn

        S = jnp.concatenate([X, W, P], axis=1)
        AS = jnp.concatenate([AX, AW, AP], axis=1)
        lam_new, coeff = rayleigh_ritz(S, AS)

        Xn = _rotate(coeff, S)
        AXn = _rotate(coeff, AS)
        # new search directions: the W/P part of the update only
        coeff_p = coeff.at[:, :nb, :].set(0)
        Pn = _rotate(coeff_p, S)
        APn = _rotate(coeff_p, AS)

        # robustness guards: if the update went non-finite (possible at the
        # f32 noise floor), keep the previous iterate; if no band has a
        # residual above the noise floor, we are done ("stalled" exit)
        ok = jnp.all(jnp.isfinite(lam_new))
        keep = lambda new, old: jnp.where(ok, new, old)
        # no-progress detection: tracked max residual of the gated bands must
        # keep improving, else the iteration is at its precision floor
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

    lam0 = jnp.real(jnp.einsum("kng,kng->kn", X.conj(), AX))
    res0 = jnp.full((nk, nb), jnp.inf)
    state0 = (X, AX, jnp.zeros_like(X), jnp.zeros_like(X), lam0,
              res0, jnp.asarray(0), jnp.asarray(nk * nb),
              jnp.asarray(False), jnp.asarray(jnp.inf), jnp.asarray(0),
              X, lam0, res0)
    (X, AX, P, AP, lam, res, it, nmv, _, _, _, Xb, lamb, resb) = \
        jax.lax.while_loop(cond, step, state0)

    # return the best iterate seen (the last one can be past the f32 noise
    # floor); recompute its residuals exactly
    use_last = jnp.max(res[:, :n_conv]) <= jnp.max(resb[:, :n_conv])
    Xf = jnp.where(use_last, X, Xb)
    Xf = ortho_qr(Xf)
    AXf = apply_A(Xf)
    lamf = jnp.real(jnp.einsum("kng,kng->kn", Xf.conj(), AXf))
    Rf = AXf - lamf[:, :, None].astype(cdtype) * Xf
    resf = jnp.linalg.norm(Rf, axis=-1)
    converged = jnp.max(resf[:, :n_conv]) < tol
    return LobpcgResult(X=Xf, eigenvalues=lamf, residual_norms=resf,
                        n_iter=it, n_matvec=nmv + nk * nb, converged=converged)
