#!/usr/bin/env python
"""Round-4 roofline probe: per-stage timings of the compact apply.

The remote tunnel has a ~1.5-2 ms per-dispatch floor, so every
measurement here is a lax.fori_loop chained ON DEVICE (one dispatch per
measurement).  Stages that change shape are measured as fwd+bwd pairs
(divide by 2); raw GEMM rooflines loop X -> (X@B1)@B2 with B2 shaped to
restore X.
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


def timeit(name, step, x0, flops=0, bytes_=0, pair=False):
    """step: shape-preserving fn; timed as LOOP on-device iterations."""
    def chained(x):
        return jax.lax.fori_loop(0, LOOP, lambda i, a: step(a), x)
    f = jax.jit(chained)
    out = jax.block_until_ready(f(x0))
    t0 = time.time()
    jax.block_until_ready(f(x0))
    dt = (time.time() - t0) / LOOP
    if pair:
        dt = dt / 2
    tf = flops / dt / 1e12 if flops else 0.0
    gb = bytes_ / dt / 1e9 if bytes_ else 0.0
    print(f"{name:36s}: {dt*1e3:8.3f} ms"
          + (f"  {tf:6.1f} TF/s" if flops else "")
          + (f"  {gb:6.0f} GB/s" if bytes_ else ""), flush=True)
    return dt


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (build_sandwich, compact_filter_ops,
                                           make_split_ham, prepare_split_data,
                                           total_potential_split)
    from dftk_tpu.kernels.dft_matmul import cdft_axis
    from dftk_tpu.ops.density import guess_density
    from dftk_tpu.ops.eigen.lobpcg import ortho_qr

    basis = build_problem(n_rep=3, Ecut=10.0)
    model = basis.model
    sd = prepare_split_data(basis, dtype=jnp.float32)
    rho = jnp.asarray(np.asarray(jax.device_get(guess_density(basis))),
                      dtype=jnp.float32)
    V, _ = jax.jit(lambda r: total_potential_split(
        basis.terms, sd, r, model.unit_cell_volume))(rho)
    ham = make_split_ham(sd, V)
    pf = sd.pruned
    vol = model.unit_cell_volume
    nb = 128
    nG = basis.nG_max
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0), (1, nb, 2 * nG),
                          jnp.float32) * mask2[:, None, :]
    U = ortho_qr(U)
    m_shape = tuple(F.shape[0] for F in pf.Ff)
    Ncomp = int(np.prod(m_shape))
    m1, m2, m3 = m_shape
    n1, n2, n3 = basis.fft_size
    print(f"Si54: nG={nG} m={m_shape} fft={basis.fft_size} nb={nb} "
          f"Ncomp={Ncomp} nproj={ham.P.shape[2]}", flush=True)

    enter, leave, apply_c = compact_filter_ops(ham, vol)
    M = build_sandwich(pf, ham.V)
    Xflat = jax.jit(enter)(U)                       # [1, nb, Ncomp, 2]
    Xc = Xflat.reshape(Xflat.shape[:2] + m_shape + (2,))

    live = pf.inv_idx < nG
    mask_c = live.astype(jnp.float32)
    kin_pad = jnp.concatenate([ham.kin, jnp.zeros((1, 1), ham.kin.dtype)], 1)
    kin_c = jax.vmap(lambda kp, iv: kp[iv])(kin_pad, pf.inv_idx) * mask_c
    P_pad = jnp.concatenate(
        [ham.P, jnp.zeros((1, 1) + ham.P.shape[2:], ham.P.dtype)], axis=1)
    P_c = jax.vmap(lambda pp, iv: pp[iv])(P_pad, pf.inv_idx) \
        * mask_c[:, :, None, None]
    npj = ham.P.shape[2]

    t_all = timeit("apply_c (full)", apply_c, Xflat)
    print(f"  -> {nb/t_all:.0f} band-applies/s", flush=True)

    # ---- shape-preserving stage pairs -------------------------------------
    fl1 = 2 * nb * m1 * m2 * (2 * n3) * (2 * m3)
    fl2 = 2 * nb * m1 * n3 * (2 * n2) * (2 * m2)
    flm = 2 * nb * n3 * n2 * (2 * m1) * (2 * m1)

    timeit("F3 fwd+bwd pair", lambda x: cdft_axis(
        cdft_axis(x, pf.Ff[2], 4), pf.Fb[2], 4), Xc,
        flops=fl1, pair=True)
    T1 = jax.jit(lambda x: cdft_axis(x, pf.Ff[2], 4))(Xc)
    timeit("F2 fwd+bwd pair", lambda x: jnp.swapaxes(cdft_axis(
        cdft_axis(x, pf.Ff[1], 3), pf.Fb[1], 4), 3, 4), T1,
        flops=fl2, pair=True)
    T2 = jax.jit(lambda x: cdft_axis(x, pf.Ff[1], 3))(T1)
    nbytes = T2.size * 4

    def tp2(x):
        y = jnp.transpose(x, (0, 1, 3, 4, 2, 5))
        return jnp.transpose(y, (0, 1, 4, 2, 3, 5))
    timeit("transpose pair", tp2, T2, bytes_=2 * nbytes, pair=True)
    T3 = jax.jit(lambda x: jnp.transpose(x, (0, 1, 3, 4, 2, 5)))(T2)

    def mid(t):
        tm = t.reshape(t.shape[:4] + (2 * m1,))
        out = jnp.einsum("kbzyi,kzyij->kbzyj", tm, M[ham.kspin])
        return out.reshape(t.shape)
    timeit("mid sandwich einsum", mid, T3, flops=flm)

    def kinmask(flat):
        return (flat * kin_c[:, None, :, None] + flat) \
            * mask_c[:, None, :, None]
    timeit("kin+mask elementwise", kinmask, Xflat,
           bytes_=3 * Xflat.size * 4)

    from dftk_tpu.ops.engine_split import _p_coeff, _pdag_psi

    def nl(flat):
        Pd = _pdag_psi(P_c, flat)
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        return _p_coeff(P_c, DPd)
    fn = 2 * (8 * nb * Ncomp * npj)
    timeit("nonlocal (compact rows)", nl, Xflat, flops=fn)

    def nl_sphere(flat):
        pad = jnp.zeros(flat.shape[:2] + (1, 2), flat.dtype)
        xy = jax.vmap(lambda f, idx: f[:, idx, :])(flat, pf.Gidx_c)
        Pd = _pdag_psi(ham.P, xy)
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        out = _p_coeff(ham.P, DPd)
        padded = jnp.concatenate([out, pad], axis=2)
        return jax.vmap(lambda p, inv: p[:, inv, :])(padded, pf.inv_idx)
    fns = 2 * (8 * nb * nG * npj)
    timeit("nonlocal (sphere+gathers)", nl_sphere, Xflat, flops=fns)

    # placement gathers alone (sphere->compact->sphere round trip)
    def place_pair(u):
        xy = jnp.stack([u[..., :nG], u[..., nG:]], axis=-1)
        flat = jax.vmap(lambda f, idx: f[:, idx, :])(
            jnp.concatenate([xy, jnp.zeros(xy.shape[:2] + (1, 2), xy.dtype)],
                            axis=2), pf.inv_idx)
        back = jax.vmap(lambda f, idx: f[:, idx, :])(flat, pf.Gidx_c)
        return jnp.concatenate([back[..., 0], back[..., 1]], axis=-1)
    timeit("place+extract pair", place_pair, U,
           bytes_=2 * (Xflat.size + U.size) * 4, pair=True)

    # ---- raw GEMM rooflines (on-device loops, shape-restoring pairs) ------
    print("--- raw dot_general rooflines (paired) ---", flush=True)
    shapes = [
        ("F3-like [131072,64]x[64,128]", nb * m1 * m2, 2 * m3, 2 * n3),
        ("K=128  [524288,128]x[128,128]", 524288, 128, 128),
        ("K=256  [262144,256]x[256,256]", 262144, 256, 256),
        ("big    [4096,4096]x[4096,4096]", 4096, 4096, 4096),
        ("nl-like [256,32768]x[32768,270]", 2 * nb, Ncomp, npj),
    ]
    for name, Mm, Kk, Nn in shapes:
        a = jnp.asarray(np.random.randn(Mm, Kk) / np.sqrt(Kk), jnp.float32)
        b = jnp.asarray(np.random.randn(Kk, Nn) / np.sqrt(Nn), jnp.float32)
        b2 = jnp.asarray(np.random.randn(Nn, Kk) / np.sqrt(Kk), jnp.float32)
        fl = Mm * Kk * Nn + Mm * Nn * Kk   # MACs of the pair
        for prec, tag in [(jax.lax.Precision.HIGHEST, "f32"),
                          (jax.lax.Precision.DEFAULT, "bf16")]:
            timeit(f"{name} {tag}",
                   lambda x, p=prec: jnp.matmul(
                       jnp.matmul(x, b, precision=p), b2, precision=p),
                   a, flops=2 * fl, pair=True)

    # batched mid-like raw
    a = jnp.asarray(np.random.randn(n3 * n2, nb, 2 * m1) / 8, jnp.float32)
    bm = jnp.asarray(np.random.randn(n3 * n2, 2 * m1, 2 * m1) / 8,
                     jnp.float32)
    fl = 2 * n3 * n2 * nb * (2 * m1) ** 2
    for prec, tag in [(jax.lax.Precision.HIGHEST, "f32"),
                      (jax.lax.Precision.DEFAULT, "bf16")]:
        timeit(f"batched mid raw {tag}",
               lambda x, p=prec: jnp.einsum("bmk,bkn->bmn", x, bm,
                                            precision=p),
               a, flops=fl)

    big = jnp.zeros(16 * 1024 * 1024, jnp.float32)
    timeit("copy 64MB (read+write)", lambda x: x + 1.0, big,
           bytes_=2 * big.size * 4)


if __name__ == "__main__":
    main()
