#!/usr/bin/env python
"""Is there a large fixed per-dispatch cost for pallas programs here?"""
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


def main():
    t1 = jnp.asarray(np.random.randn(n3, m2, 2, m1, nbt) * .01, jnp.float32)

    def k0(a_ref, o_ref):
        o_ref[...] = a_ref[...] * 0.999

    f = pl.pallas_call(
        k0,
        grid=(n3,),
        in_specs=[pl.BlockSpec((1, m2, 2, m1, nbt),
                               lambda z: (z, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m2, 2, m1, nbt),
                               lambda z: (z, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, m2, 2, m1, nbt), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("parallel",)),
    )

    for loop in (10, 20, 50, 100):
        g = jax.jit(lambda a: jax.lax.fori_loop(
            0, loop, lambda i, acc: f(acc), a))
        jax.block_until_ready(g(t1))
        for rep in range(3):
            t0 = time.time()
            jax.block_until_ready(g(t1))
            dt = time.time() - t0
            print(f"pallas copy loop={loop:4d} rep{rep}: total {dt*1e3:8.2f}"
                  f" ms  per-iter {dt/loop*1e3:7.3f} ms", flush=True)

    # pure-XLA control with the same array
    for loop in (10, 100):
        g = jax.jit(lambda a: jax.lax.fori_loop(
            0, loop, lambda i, acc: acc * 0.999, a))
        jax.block_until_ready(g(t1))
        t0 = time.time()
        jax.block_until_ready(g(t1))
        dt = time.time() - t0
        print(f"xla    mult loop={loop:4d}     : total {dt*1e3:8.2f} ms "
              f" per-iter {dt/loop*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
