#!/usr/bin/env python
"""Incremental fused-filter kernel teardown: add one stage at a time."""
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

m1 = m2 = 32
n1 = n2 = n3 = 64
nbt = 128
LOOP = 20
HI = jax.lax.Precision.HIGHEST


def dot_hi(F, x, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(F, x, dims, precision=HI,
                               preferred_element_type=jnp.float32)


def run(name, kern, extra=()):
    t1 = jnp.asarray(np.random.randn(n3, m2, 2, m1, nbt) * .01, jnp.float32)
    V = jnp.asarray(np.random.randn(n3, n1, n2), jnp.float32)
    fspecs = [pl.BlockSpec(m.shape, (lambda nd: lambda z: (0,) * nd)(m.ndim),
                           memory_space=pltpu.VMEM) for m in extra]
    f = pl.pallas_call(
        kern,
        grid=(n3,),
        in_specs=[
            pl.BlockSpec((1, m2, 2, m1, nbt), lambda z: (z, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + fspecs,
        out_specs=pl.BlockSpec((1, m2, 2, m1, nbt),
                               lambda z: (z, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, m2, 2, m1, nbt), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
    )
    try:
        g = jax.jit(lambda a, v: jax.lax.fori_loop(
            0, LOOP, lambda i, acc: f(acc, v, *extra), a))
        jax.block_until_ready(g(t1, V))
        t0 = time.time()
        jax.block_until_ready(g(t1, V))
        dt = (time.time() - t0) / LOOP
        print(f"{name:56s}: {dt*1e3:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:56s}: FAIL {str(e).splitlines()[0][:90]}", flush=True)


def main():
    F2f = jnp.asarray(np.random.randn(2 * n2, 2 * m2) / 64, jnp.float32)
    F1f = jnp.asarray(np.random.randn(2 * n1, 2 * m1) / 64, jnp.float32)
    F1b = jnp.asarray(np.random.randn(2 * m1, 2 * n1) / 64, jnp.float32)
    F2b = jnp.asarray(np.random.randn(2 * m2, 2 * n2) / 64, jnp.float32)
    ex = (F2f, F1f, F1b, F2b)

    def k0(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        o_ref[...] = a_ref[...] * 0.999
    run("0 copy only", k0, ex)

    def k1(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_hi(f2f[...], A)                       # [2n2, m1, nbt]
        o_ref[0] = dot_hi(f2b[...], B).reshape(m2, 2, m1, nbt)
    run("1 F2f+F2b only (2 dots, 3D rhs)", k1, ex)

    def k1b(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1 * nbt)
        B = dot_hi(f2f[...], A)
        o_ref[0] = dot_hi(f2b[...], B).reshape(m2, 2, m1, nbt)
    run("1b same but 2D rhs (reshape lanes)", k1b, ex)

    def k2(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_hi(f2f[...], A)
        Bt = jnp.transpose(B.reshape(n2, 2, m1, nbt),
                           (2, 1, 0, 3)).reshape(2 * m1, n2, nbt)
        Dt = jnp.transpose(Bt.reshape(m1, 2, n2, nbt),
                           (2, 1, 0, 3)).reshape(2 * n2, m1, nbt)
        o_ref[0] = dot_hi(f2b[...], Dt).reshape(m2, 2, m1, nbt)
    run("2 = 1 + two repairs", k2, ex)

    def k3(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_hi(f2f[...], A)
        Bt = jnp.transpose(B.reshape(n2, 2, m1, nbt),
                           (2, 1, 0, 3)).reshape(2 * m1, n2, nbt)
        C = dot_hi(f1f[...], Bt)                      # [2n1, n2, nbt]
        D = dot_hi(f1b[...], C)                       # [2m1, n2, nbt]
        Dt = jnp.transpose(D.reshape(m1, 2, n2, nbt),
                           (2, 1, 0, 3)).reshape(2 * n2, m1, nbt)
        o_ref[0] = dot_hi(f2b[...], Dt).reshape(m2, 2, m1, nbt)
    run("3 = 2 + F1f+F1b (4 dots total)", k3, ex)

    def k4(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_hi(f2f[...], A)
        Bt = jnp.transpose(B.reshape(n2, 2, m1, nbt),
                           (2, 1, 0, 3)).reshape(2 * m1, n2, nbt)
        C = dot_hi(f1f[...], Bt)
        Cv = C.reshape(n1, 2, n2, nbt) * v_ref[0][:, None, :, None]
        D = dot_hi(f1b[...], Cv.reshape(2 * n1, n2, nbt))
        Dt = jnp.transpose(D.reshape(m1, 2, n2, nbt),
                           (2, 1, 0, 3)).reshape(2 * n2, m1, nbt)
        o_ref[0] = dot_hi(f2b[...], Dt).reshape(m2, 2, m1, nbt)
    run("4 = full chain (with V mult)", k4, ex)


if __name__ == "__main__":
    main()
