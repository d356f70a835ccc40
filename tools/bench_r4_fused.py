#!/usr/bin/env python
"""Validate + time the fused Pallas filter kernel vs apply_local_sandwich."""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 40


def timeit(name, step, x0):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, LOOP, lambda i, a: step(a), x))
    jax.block_until_ready(f(x0))
    t0 = time.time()
    jax.block_until_ready(f(x0))
    dt = (time.time() - t0) / LOOP
    print(f"{name:44s}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (apply_local_sandwich,
                                           build_sandwich, compact_filter_ops,
                                           make_split_ham, prepare_split_data,
                                           total_potential_split)
    from dftk_tpu.kernels.dft_matmul import cdft_axis
    from dftk_tpu.kernels.fused_filter import (FusedFilterFactors,
                                               fused_filter_mid)
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
    m1, m2, m3 = m_shape
    n1, n2, n3 = basis.fft_size

    enter, leave, apply_c = compact_filter_ops(ham, vol)
    Xflat = jax.jit(enter)(U)
    x = Xflat.reshape(Xflat.shape[:2] + m_shape + (2,))

    # reference: sandwich local apply at session (highest) precision
    M = build_sandwich(pf, ham.V)
    ref = jax.jit(lambda a: apply_local_sandwich(a, pf, M, ham.kspin))(x)

    Vzxy = jnp.transpose(ham.V, (0, 3, 1, 2))[ham.kspin]   # [k, n3, n1, n2]

    def fused_local(a, factors):
        t = cdft_axis(a, pf.Ff[2], 4)                      # [k,nb,m1,m2,n3,2]
        t1 = jnp.transpose(t, (0, 4, 3, 5, 2, 1))          # [k,n3,m2,2,m1,nb]
        mid = jax.vmap(lambda tt, vv: fused_filter_mid(tt, vv, factors)
                       )(t1, Vzxy)
        y = jnp.transpose(mid, (0, 5, 4, 2, 1, 3))         # [k,nb,m1,m2,n3,2]
        return cdft_axis(y, pf.Fb[2], 4)                   # [k,nb,m1,m2,m3,2]

    for prec in ("highest", "tensor32", "default"):
        factors = FusedFilterFactors(pf, precision=prec)
        got = jax.jit(lambda a: fused_local(a, factors))(x)
        err = float(jnp.max(jnp.abs(got - ref))
                    / (float(jnp.max(jnp.abs(ref))) + 1e-30))
        t = timeit(f"fused local ({prec})  relerr={err:.1e}",
                   lambda a, f=factors: fused_local(a, f), x)

    timeit("sandwich local (session highest)",
           lambda a: apply_local_sandwich(a, pf, M, ham.kspin), x)

    # whole apply with the fused local inlined
    live = pf.inv_idx < nG
    mask_c = live.astype(jnp.float32)
    kin_pad = jnp.concatenate([ham.kin, jnp.zeros((1, 1), ham.kin.dtype)], 1)
    kin_c = jax.vmap(lambda kp, iv: kp[iv])(kin_pad, pf.inv_idx) * mask_c
    P_pad = jnp.concatenate(
        [ham.P, jnp.zeros((1, 1) + ham.P.shape[2:], ham.P.dtype)], axis=1)
    P_c = jax.vmap(lambda pp, iv: pp[iv])(P_pad, pf.inv_idx) \
        * mask_c[:, :, None, None]
    from dftk_tpu.ops.engine_split import _p_coeff, _pdag_psi

    def apply_fused(flat, factors, prec_nl):
        a = flat.reshape(flat.shape[:2] + m_shape + (2,))
        y = fused_local(a, factors)
        out = y.reshape(flat.shape) + kin_c[:, None, :, None] * flat
        Pd = _pdag_psi(P_c, flat, precision=prec_nl)
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        out = out + _p_coeff(P_c, DPd, precision=prec_nl)
        return out * mask_c[:, None, :, None]

    ref_apply = jax.jit(apply_c)(Xflat)
    for prec, prec_nl in (("highest", "highest"), ("tensor32", "highest"),
                          ("tensor32", "default"), ("default", "default")):
        factors = FusedFilterFactors(pf, precision=prec)
        got = jax.jit(lambda f: apply_fused(f, factors, prec_nl))(Xflat)
        err = float(jnp.max(jnp.abs(got - ref_apply))
                    / (float(jnp.max(jnp.abs(ref_apply))) + 1e-30))
        t = timeit(f"apply fused loc={prec} nl={prec_nl} err={err:.1e}",
                   lambda f, fc=factors, pn=prec_nl: apply_fused(f, fc, pn),
                   Xflat)
        print(f"  -> {nb/t:.0f} band-applies/s", flush=True)


if __name__ == "__main__":
    main()
