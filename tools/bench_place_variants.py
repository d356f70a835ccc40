#!/usr/bin/env python
"""Placement (sphere -> compact cube) variants, timed on the real chip."""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, U, iters=10):
    f = jax.jit(fn)
    try:
        jax.block_until_ready(jax.tree_util.tree_leaves(f(U))[0])
    except Exception as e:
        print(f"[FAIL] {name}: {str(e)[:200]}")
        return
    def chain(U):
        def body(i, u):
            r = fn(u)
            r0 = r[0] if isinstance(r, tuple) else r
            s = jnp.sum(r0.reshape(-1)[:1]) * 0.0
            return u + s
        return jax.lax.fori_loop(0, 10, body, U)
    g = jax.jit(chain)
    jax.block_until_ready(g(U))
    t0 = time.time()
    jax.block_until_ready(g(U))
    dt = (time.time() - t0) / 10
    print(f"{name:30s}: {dt*1e3:7.2f} ms")


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (_place_compact, prepare_split_data)
    from dftk_tpu.ops.eigen.lobpcg import ortho_qr

    basis = build_problem(n_rep=3, Ecut=10.0)
    sd = prepare_split_data(basis, dtype=jnp.float32)
    pf = sd.pruned
    nb = 256
    nG = basis.nG_max
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0), (1, nb, 2 * nG), jnp.float32) \
        * mask2[:, None, :]
    U = ortho_qr(U)
    m_shape = tuple(F.shape[0] for F in pf.Ff)
    N = int(np.prod(m_shape))
    print("nG:", nG, " compact:", m_shape, N)

    inv = np.asarray(jax.device_get(pf.inv_idx))          # [nk, N], nG = dead

    def xy_of(U):
        return jnp.stack([U[..., :nG], U[..., nG:]], axis=-1)

    # (a) current: stack + per-k vmap gather on axis 2
    def place_a(U):
        return _place_compact(xy_of(U), pf, m_shape)

    # (b) direct gather from U: flat (cell, c) index -> c*nG + inv[cell]
    inv0 = inv[0]
    live = (inv0 < nG)
    idx2_np = np.empty(2 * N, dtype=np.int32)
    safe = np.where(live, inv0, 0)
    idx2_np[0::2] = safe
    idx2_np[1::2] = safe + nG
    idx2 = jnp.asarray(idx2_np)
    live2 = jnp.asarray(np.repeat(live, 2).astype(np.float32))

    def place_b(U):
        out = U[:, :, idx2] * live2[None, None, :]
        return out.reshape(U.shape[:2] + m_shape + (2,))

    # (c) two separate gathers (r and i), no stack
    safe_j = jnp.asarray(safe)
    live1 = jnp.asarray(live.astype(np.float32))

    def place_c(U):
        xr = U[:, :, :nG]
        xi = U[:, :, nG:]
        cr = xr[:, :, safe_j] * live1
        ci = xi[:, :, safe_j] * live1
        return (cr.reshape(U.shape[:2] + m_shape),
                ci.reshape(U.shape[:2] + m_shape))

    # (d) one-hot matmul placement (MXU does the permutation)
    # P [nG, N] one-hot: compact = U_half @ P.  256 x 16k x 33k x 2 flops!
    # -> way too many flops; skip.

    # (d) gather along a NON-minor axis: transpose to band-minor, gather
    # rows (each index pulls a full lane-row), transpose back
    def place_d(U):
        Up = jnp.transpose(U.reshape(nb, 2, nG), (2, 0, 1))   # [nG, nb, 2]
        out = Up[safe_j] * live1[:, None, None]               # [N, nb, 2]
        out = jnp.transpose(out, (1, 0, 2))                   # [nb, N, 2]
        return out.reshape((1, nb) + m_shape + (2,))

    # (e) like (d) but keep (r, i) as separate leading slabs (no interleave)
    def place_e(U):
        Up = jnp.transpose(U.reshape(nb, 2 * nG), (1, 0))     # [2nG, nb]
        cr = Up[safe_j] * live1[:, None]                      # [N, nb]
        ci = Up[safe_j + nG] * live1[:, None]
        return cr, ci

    timeit("(0) trivial U*2 (harness floor)", lambda U: U * 2.0, U)
    timeit("(a) stack + vmap gather", place_a, U)
    timeit("(d) band-minor row gather", place_d, U)
    timeit("(e) band-minor, sep r/i", place_e, U)
    timeit("(b) direct interleaved gather", place_b, U)
    timeit("(c) two plain gathers", place_c, U)


if __name__ == "__main__":
    main()
