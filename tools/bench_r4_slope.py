#!/usr/bin/env python
"""Slope-timed comparison: XLA apply_c vs fused-Pallas apply variants."""
import os
import sys

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from axon_timing import report


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (compact_filter_ops,
                                           make_split_ham, prepare_split_data,
                                           total_potential_split,
                                           _p_coeff, _pdag_psi)
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

    for prec in ("highest", "default"):
        enter, leave, apply_c = compact_filter_ops(ham, vol, precision=prec)
        Xflat = jax.jit(enter)(U)
        t = report(f"XLA apply_c ({prec})", apply_c, Xflat)
        print(f"   -> {nb/t:.0f} band-applies/s", flush=True)

    enter, leave, apply_c = compact_filter_ops(ham, vol)
    Xflat = jax.jit(enter)(U)
    ref_apply = jax.jit(apply_c)(Xflat)

    live = pf.inv_idx < nG
    mask_c = live.astype(jnp.float32)
    kin_pad = jnp.concatenate([ham.kin, jnp.zeros((1, 1), ham.kin.dtype)], 1)
    kin_c = jax.vmap(lambda kp, iv: kp[iv])(kin_pad, pf.inv_idx) * mask_c
    P_pad = jnp.concatenate(
        [ham.P, jnp.zeros((1, 1) + ham.P.shape[2:], ham.P.dtype)], axis=1)
    P_c = jax.vmap(lambda pp, iv: pp[iv])(P_pad, pf.inv_idx) \
        * mask_c[:, :, None, None]
    Vzxy = jnp.transpose(ham.V, (0, 3, 1, 2))[ham.kspin]

    def fused_local(a, factors):
        t = cdft_axis(a, pf.Ff[2], 4)
        t1 = jnp.transpose(t, (0, 4, 3, 5, 2, 1))
        mid = jax.vmap(lambda tt, vv: fused_filter_mid(tt, vv, factors)
                       )(t1, Vzxy)
        y = jnp.transpose(mid, (0, 5, 4, 2, 1, 3))
        return cdft_axis(y, pf.Fb[2], 4)

    def apply_fused(flat, factors, prec_nl):
        a = flat.reshape(flat.shape[:2] + m_shape + (2,))
        y = fused_local(a, factors)
        out = y.reshape(flat.shape) + kin_c[:, None, :, None] * flat
        Pd = _pdag_psi(P_c, flat, precision=prec_nl)
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        out = out + _p_coeff(P_c, DPd, precision=prec_nl)
        return out * mask_c[:, None, :, None]

    for prec, prec_nl in (("highest", "highest"), ("tensor32", "highest"),
                          ("tensor32", "default"), ("default", "default")):
        factors = FusedFilterFactors(pf, precision=prec)
        got = jax.jit(lambda f: apply_fused(f, factors, prec_nl))(Xflat)
        err = float(jnp.max(jnp.abs(got - ref_apply))
                    / (float(jnp.max(jnp.abs(ref_apply))) + 1e-30))
        t = report(f"fused apply loc={prec} nl={prec_nl} err={err:.1e}",
                   lambda f, fc=factors, pn=prec_nl: apply_fused(f, fc, pn),
                   Xflat)
        print(f"   -> {nb/t:.0f} band-applies/s", flush=True)

    # isolate: fused local only vs sandwich local only
    from dftk_tpu.ops.engine_split import apply_local_sandwich, build_sandwich
    M = build_sandwich(pf, ham.V)
    x = Xflat.reshape(Xflat.shape[:2] + m_shape + (2,))
    report("sandwich local (highest)",
           lambda a: apply_local_sandwich(a, pf, M, ham.kspin), x)
    for prec in ("highest", "tensor32", "default"):
        factors = FusedFilterFactors(pf, precision=prec)
        report(f"fused local ({prec})",
               lambda a, fc=factors: fused_local(a, fc), x)

    def nl_only(flat):
        Pd = _pdag_psi(P_c, flat, precision="highest")
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        return _p_coeff(P_c, DPd, precision="highest") \
            + flat * kin_c[:, None, :, None]
    report("nonlocal+kin (highest)", nl_only, Xflat)

    def nl_only_d(flat):
        Pd = _pdag_psi(P_c, flat, precision="default")
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        return _p_coeff(P_c, DPd, precision="default") \
            + flat * kin_c[:, None, :, None]
    report("nonlocal+kin (default)", nl_only_d, Xflat)


if __name__ == "__main__":
    main()
