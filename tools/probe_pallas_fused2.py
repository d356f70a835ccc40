#!/usr/bin/env python
"""Probe 2: the exact op sequence of the fully-fused local-apply kernel.

Per complex-axis contraction: lane-concat (r||i) -> leading reshape -> GEMM
[M, 2K] @ [2K, 2N] -> lane-slice.  Axis cycling via batched last-two swaps.
"""
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


def run(name, fn, *args):
    try:
        t0 = time.time()
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"[ok]   {name}  (compile+run {time.time()-t0:.1f}s)")
        return out
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:400]}")
        return None


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    TB, m, n = 2, 32, 64

    # (a) batched swap of last two dims on a 4D block
    x4 = jnp.asarray(rng.normal(size=(TB, m, m, n)), dtype=jnp.float32)

    def k_a(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 2, 3)

    out = run("swap4d [2,32,32,64]->[2,32,64,32]",
              lambda x: pl.pallas_call(
                  k_a,
                  out_shape=jax.ShapeDtypeStruct((TB, m, n, m), jnp.float32),
                  in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                  out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x), x4)
    if out is not None:
        print("       err:", float(jnp.max(jnp.abs(out - jnp.swapaxes(x4, 2, 3)))))

    # (b) view-merge then swap: [TB, m, n*n] -> [TB, n*n, m]
    xb = jnp.asarray(rng.normal(size=(TB, m, n, n)), dtype=jnp.float32)

    def k_b(x_ref, o_ref):
        x = x_ref[:].reshape(TB, m, n * n)
        o_ref[:] = jnp.swapaxes(x, 1, 2).reshape(TB, n, n, m)

    out = run("viewswap [2,32,4096]->[2,4096,32]",
              lambda x: pl.pallas_call(
                  k_b,
                  out_shape=jax.ShapeDtypeStruct((TB, n, n, m), jnp.float32),
                  in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                  out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x), xb)
    if out is not None:
        ref = jnp.swapaxes(xb.reshape(TB, m, n * n), 1, 2).reshape(TB, n, n, m)
        print("       err:", float(jnp.max(jnp.abs(out - ref))))

    # (c) one complex contraction: concat -> reshape -> GEMM -> slice
    ar = jnp.asarray(rng.normal(size=(TB, m, m, m)), dtype=jnp.float32)
    ai = jnp.asarray(rng.normal(size=(TB, m, m, m)), dtype=jnp.float32)
    F = jnp.asarray(rng.normal(size=(2 * m, 2 * n)), dtype=jnp.float32) / m

    def k_c(ar_ref, ai_ref, f_ref, or_ref, oi_ref):
        cat = jnp.concatenate([ar_ref[:], ai_ref[:]], axis=-1)  # [TB,m,m,2m]
        y = jnp.dot(cat.reshape(TB * m * m, 2 * m), f_ref[:],
                    preferred_element_type=jnp.float32, precision=HI)
        y = y.reshape(TB, m, m, 2 * n)
        or_ref[:] = y[..., :n]
        oi_ref[:] = y[..., n:]

    out = run("contract-minor concat+GEMM+slice",
              lambda ar, ai, F: pl.pallas_call(
                  k_c,
                  out_shape=(jax.ShapeDtypeStruct((TB, m, m, n), jnp.float32),
                             jax.ShapeDtypeStruct((TB, m, m, n), jnp.float32)),
                  in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                  out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                             pl.BlockSpec(memory_space=pltpu.VMEM)))(ar, ai, F),
              ar, ai, F)
    if out is not None:
        cat = jnp.concatenate([ar, ai], axis=-1).reshape(TB * m * m, 2 * m)
        y = jnp.dot(cat, F, precision=HI).reshape(TB, m, m, 2 * n)
        err = max(float(jnp.max(jnp.abs(out[0] - y[..., :n]))),
                  float(jnp.max(jnp.abs(out[1] - y[..., n:]))))
        print("       err:", err)


if __name__ == "__main__":
    main()
