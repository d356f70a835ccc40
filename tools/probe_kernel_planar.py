#!/usr/bin/env python
"""Planar-re/im transpose-free fused filter kernel probe."""
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


def run(name, kern, extra=()):
    t1 = jnp.asarray(np.random.randn(n3, 2, m2, m1, nbt) / 8, jnp.float32)
    V = jnp.asarray(np.random.randn(n3, n1, n2), jnp.float32)
    fspecs = [pl.BlockSpec(m.shape, (lambda nd: lambda z: (0,) * nd)(m.ndim),
                           memory_space=pltpu.VMEM) for m in extra]
    f = pl.pallas_call(
        kern,
        grid=(n3,),
        in_specs=[
            pl.BlockSpec((1, 2, m2, m1, nbt), lambda z: (z, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + fspecs,
        out_specs=pl.BlockSpec((1, 2, m2, m1, nbt),
                               lambda z: (z, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, 2, m2, m1, nbt), jnp.float32),
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
        print(f"{name:52s}: FAIL {str(e).splitlines()[0][:100]}", flush=True)


def main():
    C2f = jnp.asarray(np.random.randn(n2, m2) / 8, jnp.float32)
    S2f = jnp.asarray(np.random.randn(n2, m2) / 8, jnp.float32)
    C1f = jnp.asarray(np.random.randn(n1, m1) / 8, jnp.float32)
    S1f = jnp.asarray(np.random.randn(n1, m1) / 8, jnp.float32)
    C1b = jnp.asarray(np.random.randn(m1, n1) / 8, jnp.float32)
    S1b = jnp.asarray(np.random.randn(m1, n1) / 8, jnp.float32)
    C2b = jnp.asarray(np.random.randn(m2, n2) / 8, jnp.float32)
    S2b = jnp.asarray(np.random.randn(m2, n2) / 8, jnp.float32)
    ex = (C2f, S2f, C1f, S1f, C1b, S1b, C2b, S2b)

    def dot_d(F, x, dim, prec=jax.lax.Precision.HIGHEST):
        return jax.lax.dot_general(F, x, (((1,), (dim,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=jnp.float32)

    def cplx(Cm, Sm, xr, xi, dim, prec=jax.lax.Precision.HIGHEST):
        yr = dot_d(Cm, xr, dim, prec) - dot_d(Sm, xi, dim, prec)
        yi = dot_d(Sm, xr, dim, prec) + dot_d(Cm, xi, dim, prec)
        return yr, yi

    def k_planar(a_ref, v_ref, c2f, s2f, c1f, s1f, c1b, s1b, c2b, s2b,
                 o_ref, prec=jax.lax.Precision.HIGHEST):
        Ar, Ai = a_ref[0, 0], a_ref[0, 1]                 # [m2, m1, nbt]
        Br, Bi = cplx(c2f[...], s2f[...], Ar, Ai, 0, prec)  # [n2, m1, nbt]
        Cr, Ci = cplx(c1f[...], s1f[...], Br, Bi, 1, prec)  # [n1, n2, nbt]
        Vz = v_ref[0][:, :, None]
        Cr, Ci = Cr * Vz, Ci * Vz
        Dr, Di = cplx(c1b[...], s1b[...], Cr, Ci, 0, prec)  # [m1, n2, nbt]
        Er, Ei = cplx(c2b[...], s2b[...], Dr, Di, 1, prec)  # [m2, m1, nbt]
        o_ref[0, 0] = Er
        o_ref[0, 1] = Ei
    run("planar f32 (transpose-free)", k_planar, ex)

    def k_planar_bf(a_ref, v_ref, c2f, s2f, c1f, s1f, c1b, s1b, c2b, s2b,
                    o_ref):
        def dot_b(F, x, dim):
            return jax.lax.dot_general(
                F.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                (((1,), (dim,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        def cplx_b(Cm, Sm, xr, xi, dim):
            yr = dot_b(Cm, xr, dim) - dot_b(Sm, xi, dim)
            yi = dot_b(Sm, xr, dim) + dot_b(Cm, xi, dim)
            return yr, yi
        Ar, Ai = a_ref[0, 0], a_ref[0, 1]
        Br, Bi = cplx_b(c2f[...], s2f[...], Ar, Ai, 0)
        Cr, Ci = cplx_b(c1f[...], s1f[...], Br, Bi, 1)
        Vz = v_ref[0][:, :, None]
        Cr, Ci = Cr * Vz, Ci * Vz
        Dr, Di = cplx_b(c1b[...], s1b[...], Cr, Ci, 0)
        Er, Ei = cplx_b(c2b[...], s2b[...], Dr, Di, 1)
        o_ref[0, 0] = Er
        o_ref[0, 1] = Ei
    run("planar bf16 1-pass (transpose-free)", k_planar_bf, ex)


if __name__ == "__main__":
    main()
