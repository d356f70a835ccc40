#!/usr/bin/env python
"""Round-4 shape experiments for the compact-apply hot stages.

Findings from bench_r4_probe: matmuls on this chip are SHAPE-bound
(f32 HIGHEST == bf16 DEFAULT speed); K=64 stages run at 5-12 TF/s while
K=128 square GEMMs hit 30 TF/s.  This probes the candidate fixes:
  mid:  batched [128,64]x[64,64] vs block-paired K=N=128 vs bf16
  F:    K=64 rect vs K-padded-128 vs bf16
"""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 40
HI = jax.lax.Precision.HIGHEST
DE = jax.lax.Precision.DEFAULT


def timeit(name, step, x0, flops=0, pair=False):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, LOOP, lambda i, a: step(a), x))
    jax.block_until_ready(f(x0))
    t0 = time.time()
    jax.block_until_ready(f(x0))
    dt = (time.time() - t0) / LOOP / (2 if pair else 1)
    print(f"{name:44s}: {dt*1e3:8.3f} ms"
          + (f"  {flops/dt/1e12:6.1f} TF/s(useful)" if flops else ""),
          flush=True)
    return dt


def main():
    nb, m1, n3, n2 = 128, 32, 64, 64
    ncols = n3 * n2                       # 4096 (z,y) columns
    useful = 2 * ncols * nb * (2 * m1) ** 2   # useful FLOPs of the mid

    # ---- mid variants ------------------------------------------------------
    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.randn(1, nb, n3, n2, 2 * m1) / 8, jnp.float32)
    M = jnp.asarray(rng.randn(1, n3, n2, 2 * m1, 2 * m1) / 8, jnp.float32)

    def mid_cur(x, prec=HI):
        return jnp.einsum("kbzyi,kzyij->kbzyj", x, M[jnp.zeros((1,), int)],
                          precision=prec)
    timeit("mid current (batch [128,64]x[64,64]) f32", mid_cur, t,
           flops=useful)
    timeit("mid current bf16", lambda x: mid_cur(x, DE), t, flops=useful)

    # block-paired: 2 adjacent y columns -> one K=N=128 block-diag matmul
    Mb = np.zeros((1, n3, n2 // 2, 4 * m1, 4 * m1), np.float32)
    Mnp = np.asarray(M)
    Mb[:, :, :, :2 * m1, :2 * m1] = Mnp[:, :, 0::2]
    Mb[:, :, :, 2 * m1:, 2 * m1:] = Mnp[:, :, 1::2]
    Mb = jnp.asarray(Mb)

    def mid_block2(x, prec=HI):
        xb = x.reshape(1, nb, n3, n2 // 2, 4 * m1)
        out = jnp.einsum("kbzyi,kzyij->kbzyj", xb,
                         Mb[jnp.zeros((1,), int)], precision=prec)
        return out.reshape(x.shape)
    timeit("mid block-paired (K=N=128) f32", mid_block2, t, flops=useful)
    timeit("mid block-paired bf16", lambda x: mid_block2(x, DE), t,
           flops=useful)

    # block-quad: K=N=256
    Mq = np.zeros((1, n3, n2 // 4, 8 * m1, 8 * m1), np.float32)
    for j in range(4):
        Mq[:, :, :, 2*m1*j:2*m1*(j+1), 2*m1*j:2*m1*(j+1)] = Mnp[:, :, j::4]
    Mq = jnp.asarray(Mq)

    def mid_block4(x, prec=HI):
        xb = x.reshape(1, nb, n3, n2 // 4, 8 * m1)
        out = jnp.einsum("kbzyi,kzyij->kbzyj", xb,
                         Mq[jnp.zeros((1,), int)], precision=prec)
        return out.reshape(x.shape)
    timeit("mid block-quad (K=N=256) f32", mid_block4, t, flops=useful)
    timeit("mid block-quad bf16", lambda x: mid_block4(x, DE), t,
           flops=useful)

    # batch moved: bands as batch? [4096 cols as M-dim]: one matmul per band?
    # transpose-free alt: treat (z,y) as M-dim with band-blocked rhs - skip.

    # ---- F-stage variants --------------------------------------------------
    x = jnp.asarray(rng.randn(nb * m1 * m1, 2 * m1) / 8, jnp.float32)
    F = jnp.asarray(rng.randn(2 * m1, 2 * n3) / 8, jnp.float32)
    Fb = jnp.asarray(rng.randn(2 * n3, 2 * m1) / 8, jnp.float32)
    fl = 2 * x.shape[0] * 2 * m1 * 2 * n3
    timeit("F pair rect [131k,64]x[64,128] f32",
           lambda a: jnp.matmul(jnp.matmul(a, F, precision=HI), Fb,
                                precision=HI), x, flops=fl, pair=True)
    timeit("F pair rect bf16",
           lambda a: jnp.matmul(jnp.matmul(a, F, precision=DE), Fb,
                                precision=DE), x, flops=fl, pair=True)
    # K-padded: operand zero-padded 64->128 (state twice as big: honest
    # emulation pads BOTH directions)
    xp = jnp.asarray(rng.randn(nb * m1 * m1, 4 * m1) / 8, jnp.float32)
    Fp = jnp.concatenate([F, jnp.zeros_like(F)], axis=0)      # [128, 128]
    Fbp = jnp.concatenate([Fb, jnp.zeros_like(Fb)], axis=1)   # [128, 128]
    timeit("F pair K-pad [131k,128]x[128,128] f32",
           lambda a: jnp.matmul(jnp.matmul(a, Fp, precision=HI), Fbp,
                                precision=HI), xp, flops=fl, pair=True)

    # ---- compensated bf16x3 sanity (speed) --------------------------------
    from dftk_tpu.kernels.dft_matmul import dot3_bf16, split_bf16
    Fhi, Flo = split_bf16(F)
    Fbhi, Fblo = split_bf16(Fb)
    dims = (((1,), (0,)), ((), ()))
    timeit("F pair bf16x3 (3-pass compensated)",
           lambda a: dot3_bf16(dot3_bf16(a, Fhi, Flo, dims), Fbhi, Fblo,
                               dims), x, flops=fl, pair=True)

    # accuracy of the variants vs f64 (on-host check)
    a64 = np.asarray(x, np.float64)
    F64 = np.asarray(F, np.float64)
    exact = a64 @ F64
    y_hi = np.asarray(jax.jit(lambda a: jnp.matmul(a, F, precision=HI))(x))
    y_de = np.asarray(jax.jit(lambda a: jnp.matmul(a, F, precision=DE))(x))
    y_x3 = np.asarray(jax.jit(lambda a: dot3_bf16(a, Fhi, Flo, dims))(x))
    sc = np.abs(exact).max()
    print(f"rel err vs f64: HIGHEST {np.abs(y_hi-exact).max()/sc:.2e}  "
          f"DEFAULT {np.abs(y_de-exact).max()/sc:.2e}  "
          f"bf16x3 {np.abs(y_x3-exact).max()/sc:.2e}", flush=True)


if __name__ == "__main__":
    main()
