#!/usr/bin/env python
"""Probe which reshape/transpose/dot patterns Mosaic supports on this TPU."""
import os
import sys

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kern, out_shape, *args):
    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.block_until_ready(jax.jit(f)(*args))
        print(f"{name:56s}: OK {r.shape}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:56s}: FAIL {msg}", flush=True)
        return False


def main():
    m1, m2, n1, n2, nbt = 32, 32, 64, 64, 128

    # 1. merge (m1, nbt=128) -> lanes 4096
    a = jnp.ones((2 * m2, m1, nbt), jnp.float32)
    try_kernel("reshape [64,32,128]->[64,4096]",
               lambda ar, o: o.__setitem__(
                   (Ellipsis,), ar[...].reshape(2 * m2, m1 * nbt)),
               (2 * m2, m1 * nbt), a)

    # 2. 4D sublane permutation, lanes fixed
    b = jnp.ones((n2, 2, m1, nbt), jnp.float32)
    try_kernel("transpose [64,2,32,128] (2,1,0,3)",
               lambda br, o: o.__setitem__(
                   (Ellipsis,), jnp.transpose(br[...], (2, 1, 0, 3))),
               (m1, 2, n2, nbt), b)

    # 3. 2D GEMM factor @ fat data
    F = jnp.ones((2 * n2, 2 * m2), jnp.float32)
    d = jnp.ones((2 * m2, m1 * nbt), jnp.float32)
    try_kernel("dot [128,64]@[64,4096] f32",
               lambda fr, dr, o: o.__setitem__(
                   (Ellipsis,), jax.lax.dot_general(
                       fr[...], dr[...], (((1,), (0,)), ((), ())),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)),
               (2 * n2, m1 * nbt), F, d)

    # 4. 3D dot_general (contract middle dim of 3D rhs)
    d3 = jnp.ones((2 * m2, m1, nbt), jnp.float32)
    try_kernel("dot 2D lhs x 3D rhs (contract dim0)",
               lambda fr, dr, o: o.__setitem__(
                   (Ellipsis,), jax.lax.dot_general(
                       fr[...], dr[...], (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)),
               (2 * n2, m1, nbt), F, d3)

    # 5. split sublanes [2560, 64] -> [80, 32, 64]
    e = jnp.ones((2560, 64), jnp.float32)
    try_kernel("reshape [2560,64]->[80,32,64]",
               lambda er, o: o.__setitem__(
                   (Ellipsis,), er[...].reshape(80, 32, 64)),
               (80, 32, 64), e)

    # 6. batched 3D dot (batch leading)
    X = jnp.ones((n2, nbt, 2 * m1), jnp.float32)
    M = jnp.ones((n2, 2 * m1, 2 * m1), jnp.float32)
    try_kernel("batched dot [64,128,64]@[64,64,64]",
               lambda xr, mr, o: o.__setitem__(
                   (Ellipsis,), jax.lax.dot_general(
                       xr[...], mr[...], (((2,), (1,)), ((0,), (0,))),
                       preferred_element_type=jnp.float32)),
               (n2, nbt, 2 * m1), X, M)

    # 7. merge leading dims (n2,2) -> 2n2, lanes fixed
    g = jnp.ones((n2, 2, m1, nbt), jnp.float32)
    try_kernel("reshape [64,2,32,128]->[128,32,128]",
               lambda gr, o: o.__setitem__(
                   (Ellipsis,), gr[...].reshape(2 * n2, m1, nbt)),
               (2 * n2, m1, nbt), g)

    # 8. bf16 dot with f32 accum
    Fb = jnp.ones((2 * n2, 2 * m2), jnp.bfloat16)
    db = jnp.ones((2 * m2, m1 * nbt), jnp.bfloat16)
    try_kernel("dot bf16 [128,64]@[64,4096] accum f32",
               lambda fr, dr, o: o.__setitem__(
                   (Ellipsis,), jax.lax.dot_general(
                       fr[...], dr[...], (((1,), (0,)), ((), ())),
                       precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32)),
               (2 * n2, m1 * nbt), Fb, db)


if __name__ == "__main__":
    main()
