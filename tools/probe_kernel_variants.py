#!/usr/bin/env python
"""Time fused-filter kernel variants to find where the cycles go."""
import os
import sys
import time
from functools import partial

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


def run(name, kern, extra=(), prec="highest"):
    t1 = jnp.asarray(np.random.randn(n3, m2, 2, m1, nbt), jnp.float32)
    V = jnp.asarray(np.random.randn(n3, n1, n2), jnp.float32)
    full = lambda s: pl.BlockSpec(s, lambda z: (0, 0),
                                  memory_space=pltpu.VMEM)
    fspecs = [full(m.shape) for m in extra]
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
        print(f"{name:52s}: {dt*1e3:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:52s}: FAIL {str(e).splitlines()[0][:90]}", flush=True)


def dot_hi(F, x, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(F, x, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def main():
    F2f = jnp.asarray(np.random.randn(2 * n2, 2 * m2) / 8, jnp.float32)
    F1f = jnp.asarray(np.random.randn(2 * n1, 2 * m1) / 8, jnp.float32)
    F1b = jnp.asarray(np.random.randn(2 * m1, 2 * n1) / 8, jnp.float32)
    F2b = jnp.asarray(np.random.randn(2 * m2, 2 * n2) / 8, jnp.float32)

    # A: full chain with repairs (the current kernel)
    def k_full(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_hi(f2f[...], A)
        Bt = jnp.transpose(B.reshape(n2, 2, m1, nbt),
                           (2, 1, 0, 3)).reshape(2 * m1, n2, nbt)
        C = dot_hi(f1f[...], Bt)
        Cv = C.reshape(n1, 2, n2, nbt) * v_ref[0][:, None, :, None]
        D = dot_hi(f1b[...], Cv.reshape(2 * n1, n2, nbt))
        Dt = jnp.transpose(D.reshape(m1, 2, n2, nbt),
                           (2, 1, 0, 3)).reshape(2 * n2, m1, nbt)
        out = dot_hi(f2b[...], Dt)
        o_ref[0] = out.reshape(m2, 2, m1, nbt)
    run("full chain (repairs, f32)", k_full, (F2f, F1f, F1b, F2b))

    # B: dots only, no repairs (wrong math, right shapes/FLOPs)
    def k_dots(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_hi(f2f[...], A)                        # [2n2, m1, nbt]
        C = dot_hi(f1f[...], B.reshape(2 * n1, m1, nbt))
        Cv = C.reshape(n1, 2, m1, nbt) * v_ref[0][:, :m1 * 0 + 1, None]\
            [:, 0][:, None, None, None]
        D = dot_hi(f1b[...], Cv.reshape(2 * n1, m1, nbt))
        out = dot_hi(f2b[...], D.reshape(2 * n2, m1, nbt))
        o_ref[0] = out.reshape(m2, 2, m1, nbt)
    run("dots only (no repairs, f32)", k_dots, (F2f, F1f, F1b, F2b))

    # C: repairs only (no dots)
    def k_rep(a_ref, v_ref, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        Bt = jnp.transpose(A.reshape(m2, 2, m1, nbt),
                           (2, 1, 0, 3)).reshape(2 * m1, m2, nbt)
        Cv = Bt.reshape(m1, 2, m2, nbt) * v_ref[0][:m1, None, :m2, None]
        Dt = jnp.transpose(Cv.reshape(m1, 2, m2, nbt),
                           (2, 1, 0, 3)).reshape(2 * m2, m1, nbt)
        o_ref[0] = Dt.reshape(m2, 2, m1, nbt)
    run("repairs+V only (no dots)", k_rep)

    # D: multi-dim contraction absorbing the repair
    F1f4 = jnp.asarray(np.random.randn(n1, 2, m1, 2) / 8, jnp.float32)
    F1b4 = jnp.asarray(np.random.randn(m1, 2, n1, 2) / 8, jnp.float32)

    def k_mdim(a_ref, v_ref, f2f, f1f4, f1b4, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_hi(f2f[...], A)                        # [2n2, m1, nbt]
        B4 = B.reshape(n2, 2, m1, nbt)
        # contract (m1, c) of B4 against dims (2, 3) of F1f4 [n1,2,m1,2]
        C = jax.lax.dot_general(
            f1f4[...], B4, (((2, 3), (2, 1)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # [n1, 2, n2, nbt]
        Cv = C * v_ref[0][:, None, :, None]
        D = jax.lax.dot_general(
            f1b4[...], Cv, (((2, 3), (0, 1)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # [m1, 2, n2, nbt]
        Dt = jnp.transpose(D, (2, 1, 0, 3)).reshape(2 * n2, m1, nbt)
        out = dot_hi(f2b[...], Dt)
        o_ref[0] = out.reshape(m2, 2, m1, nbt)
    run("multi-dim dot absorbs fwd repair (f32)", k_mdim,
        (F2f, F1f4, F1b4, F2b))

    # E: full chain at 1-pass bf16 dots
    def dot_bf(F, x):
        return jax.lax.dot_general(
            F.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    def k_full_bf(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
        A = a_ref[0].reshape(2 * m2, m1, nbt)
        B = dot_bf(f2f[...], A)
        Bt = jnp.transpose(B.reshape(n2, 2, m1, nbt),
                           (2, 1, 0, 3)).reshape(2 * m1, n2, nbt)
        C = dot_bf(f1f[...], Bt)
        Cv = C.reshape(n1, 2, n2, nbt) * v_ref[0][:, None, :, None]
        D = dot_bf(f1b[...], Cv.reshape(2 * n1, n2, nbt))
        Dt = jnp.transpose(D.reshape(m1, 2, n2, nbt),
                           (2, 1, 0, 3)).reshape(2 * n2, m1, nbt)
        out = dot_bf(f2b[...], Dt)
        o_ref[0] = out.reshape(m2, 2, m1, nbt)
    run("full chain (repairs, bf16 1-pass)", k_full_bf, (F2f, F1f, F1b, F2b))


if __name__ == "__main__":
    main()
