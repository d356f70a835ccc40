#!/usr/bin/env python
"""Micro-speed of individual ops INSIDE a Mosaic kernel (VMEM-resident).

Each kernel repeats one op R times on resident data (dependency-chained via
accumulation so Mosaic cannot DCE), one grid cell; reported per-op time.
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

R = 100


def run(name, make_kern, shapes, out_shape, flops=0):
    args = [jnp.asarray(np.random.randn(*s) * 0.01, jnp.float32)
            for s in shapes]
    try:
        f = pl.pallas_call(
            make_kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )
        g = jax.jit(f)
        jax.block_until_ready(g(*args))
        t0 = time.time()
        jax.block_until_ready(g(*args))
        dt = (time.time() - t0) / R
        tf = flops / dt / 1e12 if flops else 0
        print(f"{name:56s}: {dt*1e6:9.2f} us"
              + (f"  {tf:6.1f} TF/s" if flops else ""), flush=True)
    except Exception as e:
        print(f"{name:56s}: FAIL {str(e).splitlines()[0][:90]}", flush=True)


def rep_dot(dims, prec):
    def kern(f_ref, x_ref, o_ref):
        F = f_ref[...]

        def body(i, acc):
            y = jax.lax.dot_general(F, acc, dims, precision=prec,
                                    preferred_element_type=jnp.float32)
            return y * 1e-3 + acc * 0.5 if y.shape == acc.shape else acc
        # shape-preserving only when square factor; else chain manually
        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])
    return kern


def main():
    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT
    d0 = (((1,), (0,)), ((), ()))

    # square factor so the loop is shape preserving
    for K, N, prec, tag in [(128, 4096, HI, "f32"), (128, 4096, DE, "bf16"),
                            (64, 4096, HI, "f32"), (64, 4096, DE, "bf16"),
                            (64, 8192, HI, "f32"), (128, 8192, HI, "f32")]:
        run(f"dot [{K},{K}]@[{K},{N}] {tag} x{R}",
            rep_dot(d0, prec), [(K, K), (K, N)], (K, N),
            flops=2 * K * K * N)

    # contraction on dim 1 of 3D rhs
    d1 = (((1,), (1,)), ((), ()))

    def kern_d1(f_ref, x_ref, o_ref):
        F = f_ref[...]

        def body(i, acc):
            y = jax.lax.dot_general(F, acc, d1, precision=HI,
                                    preferred_element_type=jnp.float32)
            return jnp.transpose(y, (1, 0, 2)) * 1e-3 + acc * 0.5
        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])
    run(f"dot dim1 [64,64]@[64,64,128] f32 + tp x{R}", kern_d1,
        [(64, 64), (64, 64, 128)], (64, 64, 128),
        flops=2 * 64 * 64 * 64 * 128)

    # sublane transpose [n2, 2, m1, nbt] -> (2,1,0,3)
    def kern_tp(x_ref, o_ref):
        def body(i, acc):
            return jnp.transpose(acc, (2, 1, 0, 3)) * 0.999
        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])
    run(f"transpose [64,2,64,128] (2,1,0,3) x{R}", kern_tp,
        [(64, 2, 64, 128)], (64, 2, 64, 128))

    def kern_tp2(x_ref, o_ref):
        def body(i, acc):
            return jnp.transpose(acc, (1, 0, 2)) * 0.999
        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])
    run(f"transpose [64,64,128] (1,0,2) x{R}", kern_tp2,
        [(64, 64, 128)], (64, 64, 128))

    # elementwise broadcast multiply [64,2,64,128] * [64,1,64,1]
    def kern_vm(x_ref, v_ref, o_ref):
        V = v_ref[...][:, None, :, None]

        def body(i, acc):
            return acc * V * 1.001
        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])
    run(f"V-mult broadcast [64,2,64,128] x{R}", kern_vm,
        [(64, 2, 64, 128), (64, 64)], (64, 2, 64, 128))

    # lane-dim transpose: bands from lanes to sublanes
    def kern_tp3(x_ref, o_ref):
        def body(i, acc):
            return jnp.transpose(acc, (0, 2, 1)) * 0.999
        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])
    run(f"transpose [64,128,128] (0,2,1) lane swap x{R}", kern_tp3,
        [(64, 128, 128)], (64, 128, 128))


if __name__ == "__main__":
    main()
