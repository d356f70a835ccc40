#!/usr/bin/env python
"""Does a trailing re/im axis of size 2 wreck TPU layouts? Time copies and
dots of the same data in trailing-2, leading-2, and folded layouts."""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(f, x, n=20):
    g = jax.jit(lambda u: jax.lax.fori_loop(
        0, n, lambda i, a: a + jnp.sum(f(a).reshape(-1)[:1]) * 0.0, u))
    jax.block_until_ready(g(x))
    t0 = time.time()
    jax.block_until_ready(g(x))
    return (time.time() - t0) / n * 1e3


def main():
    import dftk_tpu  # noqa
    key = jax.random.PRNGKey(0)
    nb, m = 128, 32
    # elementwise x*1.0001 cost (copy-like) in three layouts
    a_t2 = jax.random.normal(key, (nb, m, m, m, 2), jnp.float32)
    a_l2 = jax.random.normal(key, (nb, 2, m, m, m), jnp.float32)
    a_fold = jax.random.normal(key, (nb, m, m, 2 * m), jnp.float32)
    print("copy trailing-2 :", t(lambda x: x * 1.0001, a_t2), "ms")
    print("copy leading-2  :", t(lambda x: x * 1.0001, a_l2), "ms")
    print("copy folded 2m  :", t(lambda x: x * 1.0001, a_fold), "ms")

    # dot: contract (m3, 2) against [m,2,n,2] vs block [2m, 2n]
    n_out = 64
    F4 = jax.random.normal(key, (m, 2, n_out, 2), jnp.float32)
    Fb = jax.random.normal(key, (2 * m, 2 * n_out), jnp.float32)

    def dot_t2(x):
        y = jax.lax.dot_general(x, F4, (((3, 4), (0, 1)), ((), ())))
        return y  # [nb, m, m, n, 2]

    def dot_blk(x):
        y = jax.lax.dot_general(x, Fb, (((3,), (0,)), ((), ())))
        return y  # [nb, m, m, 2n]

    print("dot trailing-2  :", t(dot_t2, a_t2), "ms")
    print("dot block 2m    :", t(dot_blk, a_fold), "ms")

    # nonlocal-style: P [nG, npp, 2] einsum vs separate re/im
    nG, npp = 11136, 256
    P2 = jax.random.normal(key, (nG, npp, 2), jnp.float32)
    Pr = jax.random.normal(key, (nG, npp), jnp.float32)
    Pi = jax.random.normal(key, (nG, npp), jnp.float32)
    X2 = jax.random.normal(key, (nb, nG, 2), jnp.float32)
    Xr = jax.random.normal(key, (nb, nG), jnp.float32)
    Xi = jax.random.normal(key, (nb, nG), jnp.float32)

    def nl_t2(x):
        rr = jnp.einsum("gp,ng->np", P2[..., 0], x[..., 0])
        ii = jnp.einsum("gp,ng->np", P2[..., 1], x[..., 1])
        out = jnp.einsum("gp,np->ng", P2[..., 0], rr + ii)
        return jnp.stack([out, out], -1)

    def nl_sep(xr):
        rr = jnp.einsum("gp,ng->np", Pr, xr)
        ii = jnp.einsum("gp,ng->np", Pi, Xi)
        return jnp.einsum("gp,np->ng", Pr, rr + ii)

    print("nl trailing-2   :", t(nl_t2, X2), "ms")
    print("nl separate     :", t(nl_sep, Xr), "ms")


if __name__ == "__main__":
    main()
