#!/usr/bin/env python
"""Pipeline diagnostics: dimension_semantics, loop scaling, block size."""
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
HI = jax.lax.Precision.HIGHEST


def dot_hi(F, x, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(F, x, dims, precision=HI,
                               preferred_element_type=jnp.float32)


def build(kern, extra, zblk=1, semantics=None):
    kw = {}
    params = dict(vmem_limit_bytes=100 * 2 ** 20)
    if semantics:
        params["dimension_semantics"] = semantics
    fspecs = [pl.BlockSpec(m.shape, (lambda nd: lambda z: (0,) * nd)(m.ndim),
                           memory_space=pltpu.VMEM) for m in extra]
    return pl.pallas_call(
        kern,
        grid=(n3 // zblk,),
        in_specs=[
            pl.BlockSpec((zblk, m2, 2, m1, nbt), lambda z: (z, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zblk, n1, n2), lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + fspecs,
        out_specs=pl.BlockSpec((zblk, m2, 2, m1, nbt),
                               lambda z: (z, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, m2, 2, m1, nbt), jnp.float32),
        compiler_params=pltpu.CompilerParams(**params),
    )


def run(name, f, extra, loop=20):
    t1 = jnp.asarray(np.random.randn(n3, m2, 2, m1, nbt) * .01, jnp.float32)
    V = jnp.asarray(np.random.randn(n3, n1, n2), jnp.float32)
    try:
        g = jax.jit(lambda a, v: jax.lax.fori_loop(
            0, loop, lambda i, acc: f(acc, v, *extra), a))
        jax.block_until_ready(g(t1, V))
        t0 = time.time()
        jax.block_until_ready(g(t1, V))
        dt = (time.time() - t0) / loop
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

    def full(zblk):
        def k4(a_ref, v_ref, f2f, f1f, f1b, f2b, o_ref):
            for zz in range(zblk):
                A = a_ref[zz].reshape(2 * m2, m1, nbt)
                B = dot_hi(f2f[...], A)
                Bt = jnp.transpose(B.reshape(n2, 2, m1, nbt),
                                   (2, 1, 0, 3)).reshape(2 * m1, n2, nbt)
                C = dot_hi(f1f[...], Bt)
                Cv = C.reshape(n1, 2, n2, nbt) \
                    * v_ref[zz][:, None, :, None]
                D = dot_hi(f1b[...], Cv.reshape(2 * n1, n2, nbt))
                Dt = jnp.transpose(D.reshape(m1, 2, n2, nbt),
                                   (2, 1, 0, 3)).reshape(2 * n2, m1, nbt)
                o_ref[zz] = dot_hi(f2b[...], Dt).reshape(m2, 2, m1, nbt)
        return k4

    run("copy zblk=1 semantics=None loop20", build(k0, ex), ex)
    run("copy zblk=1 parallel loop20", build(k0, ex, semantics=("parallel",)),
        ex)
    run("copy zblk=1 arbitrary loop20",
        build(k0, ex, semantics=("arbitrary",)), ex)
    run("copy zblk=1 parallel loop40",
        build(k0, ex, semantics=("parallel",)), ex, loop=40)
    run("copy zblk=8 parallel", build(k0, ex, zblk=8,
                                      semantics=("parallel",)), ex)
    run("full zblk=1 parallel", build(full(1), ex,
                                      semantics=("parallel",)), ex)
    run("full zblk=4 parallel", build(full(4), ex, zblk=4,
                                      semantics=("parallel",)), ex)
    run("full zblk=8 parallel", build(full(8), ex, zblk=8,
                                      semantics=("parallel",)), ex)


if __name__ == "__main__":
    main()
