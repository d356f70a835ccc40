"""Chebyshev-filtered subspace iteration (CheFSI) for large systems.

For big band counts the per-iteration Rayleigh-Ritz of LOBPCG (a dense
(3 nb)^2 eigensolve) dominates; CheFSI (Zhou-Saad-Tiago-Chelikowsky,
PRE 74 066704 (2006)) replaces it with

    X <- orthonormalize( p_m(H) X );  one Rayleigh-Ritz per SCF step

where p_m is a degree-m Chebyshev polynomial that amplifies the occupied
part of the spectrum and damps [lb, ub].  Per step: m H applies (pure
FFT+GEMM - ideal TPU utilisation), one CholeskyQR2 and one nb x nb eigh.

This is the production path for the Si256-class benchmarks; LOBPCG remains
the high-accuracy solver for small/medium problems.
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .lobpcg import _inner, _rotate, ortho_qr


class ChefsiResult(NamedTuple):
    X: jnp.ndarray
    eigenvalues: jnp.ndarray
    residual_norms: jnp.ndarray
    upper_bound: jnp.ndarray


def estimate_upper_bound(apply_A, shape_like, mask, n_iter=12, key=None):
    """Spectral upper bound by power iteration on a random band block."""
    if key is None:
        key = jax.random.PRNGKey(17)
    nk, _, nG = shape_like.shape
    v = jax.random.normal(key, (nk, 1, nG), dtype=shape_like.dtype)
    v = v * mask[:, None, :]
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def body(_, v):
        w = apply_A(v)
        return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                               1e-30)

    v = jax.lax.fori_loop(0, n_iter, body, v)
    w = apply_A(v)
    lam = jnp.einsum("kng,kng->kn", v, w) \
        / jnp.maximum(jnp.einsum("kng,kng->kn", v, v), 1e-30)
    return 1.1 * jnp.max(lam)          # safety margin


def chebyshev_filter(apply_A, X, degree, lb, ub, band_chunk=None,
                     enter=None, leave=None):
    """p_m(H) X with Chebyshev polynomials mapped so [lb, ub] is damped.

    Scaled three-term recurrence (Zhou et al. Algorithm 4.3 style):
    amplifies eigenvalues below lb, damps [lb, ub] to <= 1.

    band_chunk: filter in blocks of this many bands.  The recurrence is
    independent per band, so chunking bounds the three live full-width
    temporaries to chunk size - the difference between fitting and OOM for
    2000-electron problems on one chip.

    enter/leave: optional change of representation around the WHOLE
    recurrence (e.g. the compact-cube-resident filter of
    ops/engine_split.py:compact_filter_ops, which pays the sphere<->cube
    placement once per filter instead of once per apply); apply_A then
    acts in the entered representation.
    """
    e = (ub - lb) / 2
    c = (ub + lb) / 2

    def filter_block(Xb):
        if enter is not None:
            Xb = enter(Xb)
        t0 = Xb
        t1 = (apply_A(Xb) - c * Xb) * (1.0 / e)

        def body(i, carry):
            tm1, t = carry
            tn = 2.0 / e * (apply_A(t) - c * t) - tm1
            return (t, tn)

        _, tm = jax.lax.fori_loop(0, degree - 1, body, (t0, t1))
        if leave is not None:
            tm = leave(tm)
        return tm

    nb = X.shape[1]
    if band_chunk is None or band_chunk >= nb:
        return filter_block(X)
    nblk = -(-nb // band_chunk)
    pad = nblk * band_chunk - nb
    Xp = jnp.pad(X, ((0, 0), (0, pad), (0, 0)))
    blocks = jnp.moveaxis(
        Xp.reshape(X.shape[0], nblk, band_chunk, X.shape[2]), 1, 0)
    out = jax.lax.map(filter_block, blocks)
    return jnp.moveaxis(out, 0, 1).reshape(
        X.shape[0], nblk * band_chunk, X.shape[2])[:, :nb]


def chefsi_step(apply_A, X, mask, degree=8, lb=None, ub=None,
                n_conv=None, lb_margin=0.05, cycles=1, apply_filter=None,
                band_chunk=None, csplit=False, filter_wrap=None,
                apply_filter_last=None, n_exact_last=1):
    """Filter + orthonormalise + Rayleigh-Ritz cycles.

    csplit=True: X rows are realified COMPLEX bands (x; y) - the Chebyshev
    recurrence is complex-linear so the filter is unchanged, but the
    orthonormalisation and Rayleigh-Ritz use the complex-structured algebra
    (ops/eigen/csplit.py) so each physical band costs ONE apply.

    The damping window is [lb, ub]: everything ABOVE the wanted spectrum.
    lb defaults to the Ritz value at index n_conv (the first unwanted
    state) - the standard CheFSI choice (Zhou et al. 2006); amplifying the
    whole current subspace (lb = max Ritz) would not converge.

    apply_filter: optional cheaper H apply used ONLY inside the Chebyshev
    recurrence (e.g. reduced-precision matmuls).  The filter merely shapes
    the subspace; Rayleigh-Ritz and residuals stay on apply_A, so the
    returned eigenpairs keep full accuracy.

    apply_filter_last: optional SEPARATE filter apply for the final
    n_exact_last cycles.  The mixed-precision schedule (engine_split
    filter_precision='mixed') passes the 1-pass-bf16 apply as
    apply_filter and the exact f32 apply here: the output subspace is
    shaped by exact filtering (so the SCF's reachable density-residual
    floor is the f32 one), while earlier cycles run at bf16 speed.  A
    pure-bf16 filter chain was measured to cap the Si64 density residual
    at ~7e-4 (vs ~1e-4 exact) and the refined energy at 2.4e-5 Ha/atom
    off -- the trailing exact cycles remove that ceiling.

    cycles AND n_exact_last may be TRACED integers: the cycle loop is a
    lax.fori_loop and the per-cycle filter choice a lax.cond, so the SCF
    autopilot can deepen the filter when the residual stalls AND dial the
    bf16/exact cycle split per iteration (all-bf16 far from convergence,
    all-exact to finish) without recompiling -- a recompile was measured
    at 100-200 s at Si64 scale, larger than the entire remaining SCF.
    """
    if apply_filter is None:
        apply_filter = apply_A
    if apply_filter_last is None:
        apply_filter_last = apply_filter
    if ub is None:
        # with filter_wrap, apply_filter acts in the wrapped representation
        # and cannot take sphere vectors; bound the spectrum on apply_A
        ub = estimate_upper_bound(
            apply_A if filter_wrap is not None else apply_filter, X, mask)

    nb = X.shape[1]
    if n_conv is None:
        n_conv = max(1, (3 * nb) // 4)
    idx = min(n_conv, nb - 1)
    enter, leave = filter_wrap if filter_wrap is not None else (None, None)
    two_filters = apply_filter_last is not apply_filter
    # cycles may be traced (autopilot), but 0 cycles would return residuals
    # pairing sorted Ritz values with the unrotated X - meaningless
    if isinstance(cycles, int) and cycles < 1:
        raise ValueError("chefsi_step needs cycles >= 1")
    n_cycles = jnp.asarray(cycles, dtype=jnp.int32)
    n_exact = jnp.asarray(n_exact_last, dtype=jnp.int32)

    if lb is None:
        # initial (sorted) Ritz estimates for the first damping window;
        # skipped when the caller supplies lb (saves one full H apply)
        AX0 = apply_A(X)
        ritz0 = jnp.einsum("kng,kng->kn", X.conj(), AX0).real \
            / jnp.maximum(jnp.einsum("kng,kng->kn", X.conj(), X).real, 1e-30)
        ritz0 = jnp.sort(ritz0, axis=1)
    else:
        AX0 = jnp.zeros_like(X)          # carry shape only; cycles >= 1
        ritz0 = jnp.zeros((X.shape[0], nb), dtype=jnp.real(X).dtype)

    def one_cycle(i, carry):
        X, _AX, theta = carry
        if lb is None:
            lb_cur = jnp.max(theta[:, idx]) + lb_margin
        else:
            lb_cur = lb
        lb_cur = jnp.minimum(lb_cur, ub - 0.2 * jnp.abs(ub))

        def run_filter(af, Xin):
            return chebyshev_filter(af, Xin, degree, lb_cur, ub,
                                    band_chunk=band_chunk, enter=enter,
                                    leave=leave) * mask[:, None, :]

        if two_filters:
            Y = jax.lax.cond(i >= n_cycles - n_exact,
                             lambda Xin: run_filter(apply_filter_last, Xin),
                             lambda Xin: run_filter(apply_filter, Xin), X)
        else:
            Y = run_filter(apply_filter, X)
        if csplit:
            from .csplit import cgram, ceigh_pairs, crotate, ortho_qr_csplit
            Y = ortho_qr_csplit(Y)
            AY = apply_A(Y)
            Hr, Hi = cgram(Y, AY)
            pert = 1e4 * float(jnp.finfo(Y.dtype).eps)
            theta, (Cr, Ci) = ceigh_pairs(Hr, Hi, perturb=pert)
            Xn = crotate(Cr, Ci, Y)
            AXn = crotate(Cr, Ci, AY)
            # exact Rayleigh quotients (ceigh's pair-splitting ramp biases
            # its eigenvalues by up to ~1e4 eps |H|)
            theta = jnp.einsum("kng,kng->kn", Xn, AXn)
        else:
            Y = ortho_qr(Y)
            AY = apply_A(Y)
            Hred = _inner(Y, AY)
            Hred = (Hred + Hred.conj().swapaxes(1, 2)) / 2
            theta, C = jnp.linalg.eigh(Hred)
            Xn = _rotate(C, Y)
            AXn = _rotate(C, AY)
            theta = theta.real.astype(ritz0.dtype)
        return (Xn, AXn, theta)

    X, AX_new, theta = jax.lax.fori_loop(0, n_cycles, one_cycle,
                                         (X, AX0, ritz0))

    R = AX_new - theta[:, :, None].astype(X.dtype) * X
    res = jnp.linalg.norm(R, axis=-1)
    return ChefsiResult(X=X, eigenvalues=theta,
                        residual_norms=res, upper_bound=jnp.asarray(ub))
