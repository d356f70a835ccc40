#!/usr/bin/env python
"""Per-stage timings of the z-major fused apply (find the regression)."""
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
    print(f"{name:46s}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (compact_filter_ops, make_split_ham,
                                           prepare_split_data,
                                           total_potential_split)
    from dftk_tpu.kernels.fused_filter import (FusedFilterFactors, dot_z,
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
    m_shape = tuple(F.shape[0] for F in pf.Ff)
    m1, m2, m3 = m_shape
    n1, n2, n3 = basis.fft_size
    print(f"m_shape={m_shape} fft={basis.fft_size} nG={nG} "
          f"nproj={ham.P.shape[-2]}", flush=True)
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0), (1, nb, 2 * nG),
                          jnp.float32) * mask2[:, None, :]
    U = ortho_qr(U)
    Vzxy = jnp.transpose(ham.V, (0, 3, 1, 2))[ham.kspin]

    for prec in ("highest", "tensor32", "default"):
        print(f"--- {prec}", flush=True)
        factors = FusedFilterFactors(pf, precision=prec)
        enter, leave, apply_c = compact_filter_ops(
            ham, vol, precision=prec, use_pallas=True)
        X = jax.jit(enter)(U)

        # stage: F3 fwd (shape-changing; time fwd+bwd pair /2)
        def f3_pair(x):
            T = dot_z(factors.f3f, x, prec)
            return dot_z(factors.f3b, T, prec)
        t = timeit("F3 fwd+bwd pair", f3_pair, X) / 2

        # stage: pallas mid (shape-preserving)
        T5 = jax.jit(lambda x: dot_z(factors.f3f, x, prec).reshape(
            1, n3, 2, m2, m1, nb))(X)
        timeit("pallas mid", lambda tt: jax.vmap(
            lambda a, v: fused_filter_mid(a, v, factors))(tt, Vzxy), T5)

        # whole apply
        timeit("whole apply_c", jax.jit(apply_c), X)

        # kinetic+mask only
        kin = jnp.ones((1, m3, 1, m2, m1, 1), jnp.float32)

        def kinmask(x):
            x6 = x.reshape(1, m3, 2, m2, m1, nb)
            return ((x6 * kin) * kin).reshape(x.shape)
        timeit("kin+mask elementwise", kinmask, X)


if __name__ == "__main__":
    main()
