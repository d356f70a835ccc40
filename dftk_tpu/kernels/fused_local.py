"""Fully-fused local-potential apply as a Pallas TPU kernel.

The local part of H*psi is, per band,

    sphere -> compact cube -> 3 complex axis-DFTs -> *V(r) -> 3 inverse
    axis-DFTs -> compact cube -> sphere

(see ops/engine_split.py; reference hot loop `src/terms/Hamiltonian.jl:137-192`
does the same via per-band FFT round trips).  Staged in XLA each arrow is an
HBM round trip of the full cube - ~3.4 GB per 128-band apply on Si54.  This
kernel keeps the ENTIRE chain per band tile resident in VMEM: HBM sees only
the compact-cube coefficients in and out (~0.5 MB/band) plus the potential
once per k-point.

In-kernel rules established by probing the axon v5e backend
(tools/probe_pallas_fused*.py):
  * complex axis contraction = lane-concat (r||i) -> leading reshape ->
    one [M, 2m] @ [2m, 2n] GEMM with the [[C, S], [-S, C]] block factor ->
    lane-slice.  K/N extents are 2m_a/2n_a (m padded to sublane multiples).
  * axis cycling via jnp.swapaxes(_, 1, 2) / (_, 2, 3) on the 4D band tile
    (Mosaic lowers these; minor-dim-merging reshapes are NOT supported).
  * everything f32 with HIGHEST (6-pass) matmul precision by default.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _swap23(a):
    return jnp.swapaxes(a, 2, 3)


def _swap12(a):
    return jnp.swapaxes(a, 1, 2)


def _make_kernel(TB, m, n, precision):
    """Kernel body closure for band-tile TB, compact dims m=(m1,m2,m3),
    grid dims n=(n1,n2,n3)."""
    m1, m2, m3 = m
    n1, n2, n3 = n

    def cmul(ar, ai, F_ref, n_out):
        """Contract the minor axis (complex) with a block factor [2K, 2N]."""
        sh = ar.shape
        cat = jnp.concatenate([ar, ai], axis=-1)
        y = jnp.dot(cat.reshape(-1, 2 * sh[-1]), F_ref[:],
                    preferred_element_type=ar.dtype,
                    precision=precision)
        y = y.reshape(sh[:-1] + (2 * n_out,))
        return y[..., :n_out], y[..., n_out:]

    def kernel(xr_ref, xi_ref, v_ref,
               f3_ref, f2_ref, f1_ref, b1_ref, b2_ref, b3_ref,
               or_ref, oi_ref):
        ar = xr_ref[0]                                   # [TB, m1, m2, m3]
        ai = xi_ref[0]
        # forward: contract m3 (minor), m2, m1 -> real space (z, y, x)
        ar, ai = cmul(ar, ai, f3_ref, n3)                # [TB, m1, m2, n3]
        ar, ai = _swap23(ar), _swap23(ai)                # [TB, m1, n3, m2]
        ar, ai = cmul(ar, ai, f2_ref, n2)                # [TB, m1, n3, n2]
        ar, ai = _swap12(ar), _swap12(ai)                # [TB, n3, m1, n2]
        ar, ai = _swap23(ar), _swap23(ai)                # [TB, n3, n2, m1]
        ar, ai = cmul(ar, ai, f1_ref, n1)                # [TB, n3, n2, n1]
        v = v_ref[0][None]                               # [1, n3, n2, n1]
        ar = ar * v
        ai = ai * v
        # backward: contract n1 (minor), n2, n3 -> compact cube
        ar, ai = cmul(ar, ai, b1_ref, m1)                # [TB, n3, n2, m1]
        ar, ai = _swap23(ar), _swap23(ai)                # [TB, n3, m1, n2]
        ar, ai = _swap12(ar), _swap12(ai)                # [TB, m1, n3, n2]
        ar, ai = cmul(ar, ai, b2_ref, m2)                # [TB, m1, n3, m2]
        ar, ai = _swap23(ar), _swap23(ai)                # [TB, m1, m2, n3]
        ar, ai = cmul(ar, ai, b3_ref, m3)                # [TB, m1, m2, m3]
        or_ref[0] = ar
        oi_ref[0] = ai

    return kernel


def fused_local_apply(xr_c, xi_c, V_rev, pf, precision=None, band_tile=4,
                      interpret=False):
    """Apply V(r) in real space to compact-cube coefficients, fused.

    xr_c, xi_c: [nk, nb, m1, m2, m3] compact-cube coefficients (already
        scattered from the sphere).
    V_rev: [nk, n3, n2, n1] local potential per k-point, reversed layout.
    pf: PrunedFFT with block factors (ops/engine_split.build_pruned_fft).
    Returns (yr_c, yi_c) with the same compact layout.
    """
    nk, nb = xr_c.shape[:2]
    m = tuple(xr_c.shape[2:])
    n3, n2, n1 = V_rev.shape[1:]
    n = (n1, n2, n3)
    TB = band_tile
    pad = (-nb) % TB
    if pad:
        widths = ((0, 0), (0, pad)) + ((0, 0),) * 3
        xr_c = jnp.pad(xr_c, widths)
        xi_c = jnp.pad(xi_c, widths)
    nbp = nb + pad

    if precision is None or precision == "highest":
        prec = jax.lax.Precision.HIGHEST
    elif isinstance(precision, str):
        prec = getattr(jax.lax.Precision, precision.upper())
    else:
        prec = precision

    kernel = _make_kernel(TB, m, n, prec)
    m1, m2, m3 = m

    grid = (nk, nbp // TB)
    band_spec = pl.BlockSpec((1, TB, m1, m2, m3),
                             lambda k, t: (k, t, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, n3, n2, n1), lambda k, t: (k, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    f_spec = [pl.BlockSpec(F.shape, lambda k, t: (0, 0),
                           memory_space=pltpu.VMEM)
              for F in (pf.Fblk_f + pf.Fblk_b)]

    flops_band = 0
    for a in range(3):
        rest = int(np.prod(m[:a])) * int(np.prod(n[a + 1:]))
        flops_band += 2 * 2 * rest * (2 * m[a]) * (2 * n[a])

    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(xr_c.shape, xr_c.dtype),
                   jax.ShapeDtypeStruct(xi_c.shape, xi_c.dtype)),
        grid=grid,
        in_specs=[band_spec, band_spec, v_spec] + f_spec,
        out_specs=(band_spec, band_spec),
        cost_estimate=pl.CostEstimate(
            flops=flops_band * nbp * nk,
            bytes_accessed=4 * (2 * 2 * nk * nbp * m1 * m2 * m3
                                + nk * n1 * n2 * n3),
            transcendentals=0),
        interpret=interpret,
    )(xr_c, xi_c, V_rev, *pf.Fblk_f, *pf.Fblk_b)
    yr, yi = out
    if pad:
        yr, yi = yr[:, :nb], yi[:, :nb]
    return yr, yi


def place_compact_sep(x, inv_idx, m_shape):
    """Sphere coeffs [nk, nb, nG] -> compact cube via the inverse gather
    map (see engine_split._place_compact)."""
    pad = jnp.zeros(x.shape[:2] + (1,), x.dtype)
    padded = jnp.concatenate([x, pad], axis=2)
    flat = jax.vmap(lambda p, inv: p[:, inv])(padded, inv_idx)
    return flat.reshape(x.shape[:2] + tuple(m_shape))


def scatter_compact_sep(x, Gidx_c, mask, m_shape):
    """Real sphere coefficients [nk, nb, nG] -> compact cube
    [nk, nb, m1, m2, m3] (injective set-scatter; pad rows to dump slots)."""
    N = int(np.prod(m_shape))
    nG = mask.shape[-1]
    c = x * mask[:, None, :]
    dump = N + jnp.arange(nG, dtype=jnp.int32)
    idx_safe = jnp.where(mask > 0, Gidx_c.astype(jnp.int32), dump[None, :])

    def one_k(c_k, idx):
        flat = jnp.zeros((c_k.shape[0], N + nG), dtype=c_k.dtype)
        return flat.at[:, idx].set(c_k, unique_indices=True)[:, :N]

    flat = jax.vmap(one_k)(c, idx_safe)
    return flat.reshape(c.shape[:2] + tuple(m_shape))


def gather_compact_sep(cube, Gidx_c, mask):
    flat = cube.reshape(cube.shape[:2] + (-1,))
    out = jax.vmap(lambda f, idx: f[:, idx])(flat, Gidx_c)
    return out * mask[:, None, :]
