#!/usr/bin/env python
"""Probe Mosaic/Pallas capabilities needed by the fused local-apply kernel.

Checks, on whatever backend JAX finds (run on the axon TPU):
  1. 2D transpose of [32, 8192] <-> [8192, 32] f32 inside a kernel
  2. batched last-two-dims swap [X, 64, 2] -> [X, 2, 64]
  3. blocked realified GEMM [4096, 64] @ [64, 128] with precision=HIGHEST
  4. a miniature fused chain: transpose -> GEMM -> multiply -> GEMM -> transpose
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


def run(name, fn, *args):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"[ok]   {name}: {[getattr(o, 'shape', o) for o in jax.tree_util.tree_leaves(out)]}")
        return out
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    print("devices:", jax.devices())
    m1, R = 32, 8192
    x = jnp.asarray(np.random.default_rng(0).normal(size=(m1, R)),
                    dtype=jnp.float32)

    # 1. 2D transpose
    def t_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    def t2d(x):
        return pl.pallas_call(
            t_kernel,
            out_shape=jax.ShapeDtypeStruct((R, m1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    out = run("2D transpose [32,8192]", t2d, x)
    if out is not None:
        err = float(jnp.max(jnp.abs(out - x.T)))
        print("       err:", err)

    # 2. batched last-two swap
    y = jnp.asarray(np.random.default_rng(1).normal(size=(2048, 64, 2)),
                    dtype=jnp.float32)

    def s_kernel(y_ref, o_ref):
        o_ref[:] = jnp.swapaxes(y_ref[:], 1, 2)

    def swap(y):
        return pl.pallas_call(
            s_kernel,
            out_shape=jax.ShapeDtypeStruct((2048, 2, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(y)

    out = run("batched swap [2048,64,2]", swap, y)
    if out is not None:
        err = float(jnp.max(jnp.abs(out - jnp.swapaxes(y, 1, 2))))
        print("       err:", err)

    # 3. GEMM with precision
    A = jnp.asarray(np.random.default_rng(2).normal(size=(4096, 64)),
                    dtype=jnp.float32)
    B = jnp.asarray(np.random.default_rng(3).normal(size=(64, 128)),
                    dtype=jnp.float32)

    def g_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    def gemm(a, b):
        return pl.pallas_call(
            g_kernel,
            out_shape=jax.ShapeDtypeStruct((4096, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    out = run("GEMM [4096,64]@[64,128] HIGHEST", gemm, A, B)
    if out is not None:
        ref = jnp.dot(A, B, precision=jax.lax.Precision.HIGHEST)
        print("       err:", float(jnp.max(jnp.abs(out - ref))))

    # 4. mini fused chain with a grid over a leading band axis
    TB, nb = 2, 8
    xb = jnp.asarray(np.random.default_rng(4).normal(size=(nb, m1, R)),
                     dtype=jnp.float32)
    F = jnp.asarray(np.random.default_rng(5).normal(size=(2 * m1, 2 * m1)),
                    dtype=jnp.float32) / m1
    V = jnp.asarray(np.random.default_rng(6).normal(size=(R // 2, 1, m1)),
                    dtype=jnp.float32)  # broadcast over the c axis

    def f_kernel(x_ref, f_ref, v_ref, o_ref):
        x = x_ref[:]                                   # [TB, m1, R]
        y = jnp.swapaxes(x, 1, 2)                      # [TB, R, m1]
        y = y.reshape(TB * (R // 2), 2 * m1)           # blocked (c, m1)
        y = jnp.dot(y, f_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(TB, R // 2, 2, m1) * v_ref[:][None]
        y = y.reshape(TB * (R // 2), 2 * m1)
        y = jnp.dot(y, f_ref[:].T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(TB, R, m1)
        o_ref[:] = jnp.swapaxes(y, 1, 2)

    def fused(xb, F, V):
        return pl.pallas_call(
            f_kernel,
            out_shape=jax.ShapeDtypeStruct((nb, m1, R), jnp.float32),
            grid=(nb // TB,),
            in_specs=[
                pl.BlockSpec((TB, m1, R), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * m1, 2 * m1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R // 2, 1, m1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, m1, R), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(xb, F, V)

    out = run("fused chain grid", fused, xb, F, V)
    if out is not None:
        def ref_fn(xb):
            y = jnp.swapaxes(xb, 1, 2).reshape(nb * (R // 2), 2 * m1)
            y = jnp.dot(y, F, precision=jax.lax.Precision.HIGHEST)
            y = y.reshape(nb, R // 2, 2, m1) * V[None]
            y = y.reshape(nb * (R // 2), 2 * m1)
            y = jnp.dot(y, F.T, precision=jax.lax.Precision.HIGHEST)
            return jnp.swapaxes(y.reshape(nb, R, m1), 1, 2)
        err = float(jnp.max(jnp.abs(out - ref_fn(xb))))
        print("       err:", err)

        # timing
        f = jax.jit(fused)
        jax.block_until_ready(f(xb, F, V))
        t0 = time.time()
        for _ in range(10):
            out = f(xb, F, V)
        jax.block_until_ready(out)
        print(f"       10 iters: {time.time() - t0:.4f} s")


if __name__ == "__main__":
    main()
