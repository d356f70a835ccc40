#!/usr/bin/env python
"""Per-stage timing of the compact sandwich apply (real chip)."""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    m1 = m_shape[0]
    enter, leave, apply_c = compact_filter_ops(ham, vol)
    M = build_sandwich(pf, ham.V)
    Xc = jax.jit(enter)(U)
    Xc6 = Xc.reshape(Xc.shape[:2] + m_shape + (2,))

    live = pf.inv_idx < nG
    mask_c = live.astype(jnp.float32)
    kin_pad = jnp.concatenate([ham.kin, jnp.zeros((1, 1), ham.kin.dtype)], 1)
    kin_c = jax.vmap(lambda kp, iv: kp[iv])(kin_pad, pf.inv_idx) * mask_c
    P_pad = jnp.concatenate(
        [ham.P, jnp.zeros((1, 1) + ham.P.shape[2:], ham.P.dtype)], axis=1)
    P_c = jax.vmap(lambda pp, iv: pp[iv])(P_pad, pf.inv_idx) \
        * mask_c[:, :, None, None]

    def f1(x):   # fwd 2 transforms
        t = cdft_axis(x, pf.Ff[2], 4, None)
        return cdft_axis(t, pf.Ff[1], 3, None)

    def f2(x):   # + transpose
        return jnp.transpose(f1(x), (0, 1, 3, 4, 2, 5))

    def f3(x):   # + mid einsum
        t = f2(x)
        tm = t.reshape(t.shape[:4] + (2 * m1,))
        mid = jnp.einsum("kbzyi,kzyij->kbzyj", tm, M[ham.kspin])
        return mid.reshape(t.shape)

    def f4(x):   # + back 2 transforms
        y = cdft_axis(f3(x), pf.Fb[1], 3, None)
        return cdft_axis(y, pf.Fb[2], 2, None)

    def f5(x):   # + kin + mask (flat ops)
        flat = x.reshape(x.shape[:2] + (Ncomp, 2))
        out = f4(x).reshape(flat.shape) + kin_c[:, None, :, None] * flat
        return (out * mask_c[:, None, :, None]).reshape(x.shape)

    def nl_only(x):
        from dftk_tpu.ops.engine_split import _p_coeff, _pdag_psi
        flat = x.reshape(x.shape[:2] + (Ncomp, 2))
        Pd = _pdag_psi(P_c, flat)
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        return _p_coeff(P_c, DPd).reshape(x.shape)

    prev = 0.0
    for name, fn in [("fwd2", f1), ("+transpose", f2), ("+mid", f3),
                     ("+back2", f4), ("+kin+mask", f5),
                     ("nonlocal only", nl_only)]:
        g = jax.jit(lambda u, fn=fn: jax.lax.fori_loop(
            0, 10, lambda i, a: a + jnp.sum(fn(a).reshape(-1)[:1]) * 0.0, u))
        jax.block_until_ready(g(Xc6))
        t0 = time.time()
        jax.block_until_ready(g(Xc6))
        dt = (time.time() - t0) / 10
        print(f"{name:14s}: {dt*1e3:7.2f} ms (delta {1e3*(dt-prev):+6.2f})")
        prev = dt


if __name__ == "__main__":
    main()
