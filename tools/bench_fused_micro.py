#!/usr/bin/env python
"""Micro-bench the fused local-apply kernel and ablations on the real chip."""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST
NB, M, N = 256, 32, 64


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    try:
        jax.block_until_ready(f(*args))
    except Exception as e:
        print(f"[FAIL] {name}: {str(e)[:250]}")
        return None
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


def cmul(ar, ai, F, n_out, prec=HI):
    sh = ar.shape
    cat = jnp.concatenate([ar, ai], axis=-1)
    y = jnp.dot(cat.reshape(-1, 2 * sh[-1]), F,
                preferred_element_type=ar.dtype, precision=prec)
    y = y.reshape(sh[:-1] + (2 * n_out,))
    return y[..., :n_out], y[..., n_out:]


s23 = lambda a: jnp.swapaxes(a, 2, 3)
s12 = lambda a: jnp.swapaxes(a, 1, 2)


def kernel_full(xr_ref, xi_ref, v_ref, f_ref, g_ref, or_ref, oi_ref):
    ar, ai = xr_ref[0], xi_ref[0]                 # [1, M, M, M]
    ar, ai = cmul(ar, ai, f_ref[:], N)            # [1,M,M,N]
    ar, ai = s23(ar), s23(ai)                     # [1,M,N,M]
    ar, ai = cmul(ar, ai, f_ref[:], N)            # [1,M,N,N]
    ar, ai = s12(ar), s12(ai)                     # [1,N,M,N]
    ar, ai = s23(ar), s23(ai)                     # [1,N,N,M]
    ar, ai = cmul(ar, ai, f_ref[:], N)            # [1,N,N,N]
    v = v_ref[0][None]
    ar = ar * v
    ai = ai * v
    ar, ai = cmul(ar, ai, g_ref[:], M)            # [1,N,N,M]
    ar, ai = s23(ar), s23(ai)                     # [1,N,M,N]
    ar, ai = s12(ar), s12(ai)                     # [1,M,N,N]
    ar, ai = cmul(ar, ai, g_ref[:], M)            # [1,M,N,M]
    ar, ai = s23(ar), s23(ai)                     # [1,M,M,N]
    ar, ai = cmul(ar, ai, g_ref[:], M)            # [1,M,M,M]
    or_ref[0] = ar
    oi_ref[0] = ai


def kernel_swaponly(xr_ref, xi_ref, v_ref, f_ref, g_ref, or_ref, oi_ref):
    """12 swaps at production-like sizes, one multiply, no GEMMs."""
    ar, ai = xr_ref[0], xi_ref[0]
    big_r = jnp.broadcast_to(ar[:, :, :, :1], (1, M, M, N)) * 1.0
    big_i = jnp.broadcast_to(ai[:, :, :, :1], (1, M, M, N)) * 1.0
    for _ in range(3):
        big_r, big_i = s23(big_r), s23(big_i)
        big_r, big_i = s12(big_r), s12(big_i)
        big_r, big_i = s23(big_r), s23(big_i)
        big_r, big_i = s12(big_r), s12(big_i)
    or_ref[0] = big_r[:, :M, :M, :M] + xr_ref[0]
    oi_ref[0] = big_i[:, :M, :M, :M] + xi_ref[0]


def run_variant(name, kernel):
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=(1, NB, M, M, M)), dtype=jnp.float32)
    xi = jnp.asarray(rng.normal(size=(1, NB, M, M, M)), dtype=jnp.float32)
    V = jnp.asarray(rng.normal(size=(1, N, N, N)), dtype=jnp.float32)
    F = jnp.asarray(rng.normal(size=(2 * M, 2 * N)), dtype=jnp.float32)
    G = jnp.asarray(rng.normal(size=(2 * N, 2 * M)), dtype=jnp.float32)

    band_spec = pl.BlockSpec((1, 1, M, M, M), lambda k, t: (k, t, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, N, N, N), lambda k, t: (k, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    fg_spec = [pl.BlockSpec(F.shape, lambda k, t: (0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec(G.shape, lambda k, t: (0, 0),
                            memory_space=pltpu.VMEM)]

    def one(xr, xi):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct(xr.shape, xr.dtype),) * 2,
            grid=(1, NB),
            in_specs=[band_spec, band_spec, v_spec] + fg_spec,
            out_specs=(band_spec, band_spec),
        )(xr, xi, V, F, G)

    def call(xr, xi, V, F, G):
        # chain ON DEVICE: output feeds the next input, one dispatch
        return jax.lax.fori_loop(0, 10, lambda i, c: one(*c), (xr, xi))

    dt = timeit(f"kernel[{name}] {NB} bands x10 chained", call,
                xr, xi, V, F, G, iters=3)
    if dt:
        print(f"   -> per apply: {dt/10*1e3:.2f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    run_variant("full", kernel_full)
    run_variant("swaponly", kernel_swaponly)


if __name__ == "__main__":
    main()
