#!/usr/bin/env python
"""Round-4 experiment: single-GEMM nonlocal + precision sweep of apply_c.

Compares the 4-einsum realified nonlocal against a restructured version
where P is read ONCE per direction:
  Pd:   X2 [k, 2nb, Ncomp] @ P2 [k, Ncomp, 2npj]  (all 4 products as blocks)
  coef: C2 [k, 2npj, 2nb]  with P2 read once -> [k, Ncomp, 2nb]
Numerics must match the 4-einsum version exactly (same FLOPs, same order
class), throughput should ~2x because P (70 MB on Si54) streams once.
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


def timeit(name, step, x0, flops=0):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, LOOP, lambda i, a: step(a), x))
    jax.block_until_ready(f(x0))
    t0 = time.time()
    jax.block_until_ready(f(x0))
    dt = (time.time() - t0) / LOOP
    tf = flops / dt / 1e12 if flops else 0.0
    print(f"{name:44s}: {dt*1e3:8.3f} ms" + (f"  {tf:6.1f} TF/s" if flops else ""),
          flush=True)
    return dt


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (compact_filter_ops, make_split_ham,
                                           prepare_split_data,
                                           total_potential_split,
                                           _pdag_psi, _p_coeff)
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
    npj = ham.P.shape[2]

    # whole apply at each precision
    for prec in ["highest", "default"]:
        enter, leave, apply_c = compact_filter_ops(ham, vol, precision=prec)
        Xflat = jax.jit(enter)(U)
        t = timeit(f"apply_c ({prec})", apply_c, Xflat)
        print(f"  -> {nb/t:.0f} band-applies/s", flush=True)

    enter, leave, apply_c = compact_filter_ops(ham, vol)
    Xflat = jax.jit(enter)(U)

    # compact projectors (same construction as compact_filter_ops)
    live = pf.inv_idx < nG
    mask_c = live.astype(jnp.float32)
    P_pad = jnp.concatenate(
        [ham.P, jnp.zeros((1, 1) + ham.P.shape[2:], ham.P.dtype)], axis=1)
    P_c = jax.vmap(lambda pp, iv: pp[iv])(P_pad, pf.inv_idx) \
        * mask_c[:, :, None, None]

    def nl_old(flat):
        Pd = _pdag_psi(P_c, flat)
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        return _p_coeff(P_c, DPd)

    # --- restructured: P2 [k, Ncomp, 2npj] (contiguous reshape of P_c) ---
    P2 = P_c.reshape(P_c.shape[0], Ncomp, 2 * npj)   # (proj, reim) interleave

    def nl_new(flat):
        # flat [k, nb, Ncomp, 2] -> X2 [k, 2nb, Ncomp]
        X2 = jnp.concatenate([flat[..., 0], flat[..., 1]], axis=1)
        Y = jnp.einsum("kng,kgp->knp", X2, P2)       # [k, 2nb, 2npj]
        Y = Y.reshape(Y.shape[0], 2, -1, npj, 2)     # [k, (r,i)b, nb, npj, (r,i)p]
        rr, ri = Y[:, 0, ..., 0], Y[:, 0, ..., 1]
        ir, ii = Y[:, 1, ..., 0], Y[:, 1, ..., 1]
        Pd = jnp.stack([rr + ii, ri - ir], axis=-1)  # conj(P)^T psi [k,nb,npj,2]
        DPd = jnp.einsum("pq,knqc->knpc", ham.D, Pd)
        # coeff: out_r = Pr cr - Pi ci ; out_i = Pr ci + Pi cr
        # C2 [k, 2npj, 2nb]: rows (proj, reim) interleaved to match P2 cols
        cr, ci = DPd[..., 0], DPd[..., 1]
        C = jnp.stack([jnp.stack([cr, ci], axis=-1),          # Pr row
                       jnp.stack([-ci, cr], axis=-1)], axis=-2)
        # C [k, nb, npj, 2(pr/pi), 2(outr/outi)] -> [k, npj*2, nb*2]
        C2 = jnp.transpose(C, (0, 2, 3, 1, 4)).reshape(
            C.shape[0], 2 * npj, -1)
        O = jnp.einsum("kgp,kpn->kgn", P2, C2)       # [k, Ncomp, 2nb]
        O = O.reshape(O.shape[0], Ncomp, -1, 2)
        return jnp.transpose(O, (0, 2, 1, 3))        # [k, nb, Ncomp, 2]

    a = jax.jit(nl_old)(Xflat)
    b = jax.jit(nl_new)(Xflat)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
    print(f"nl_new vs nl_old rel err: {err:.2e}", flush=True)

    fn = 2 * (8 * nb * Ncomp * npj)
    timeit("nonlocal old (4-einsum x2)", nl_old, Xflat, flops=fn)
    timeit("nonlocal new (single-GEMM x2)", nl_new, Xflat, flops=fn)


if __name__ == "__main__":
    main()
