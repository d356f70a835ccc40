#!/usr/bin/env python
"""Validate + time the z-major fused compact filter vs the sandwich path."""
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
    print(f"{name:52s}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (compact_filter_ops, make_split_ham,
                                           prepare_split_data,
                                           total_potential_split)
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
    vol = model.unit_cell_volume
    nb = 128
    nG = basis.nG_max
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0), (1, nb, 2 * nG),
                          jnp.float32) * mask2[:, None, :]
    U = ortho_qr(U)

    # reference: the sandwich compact path at session (highest) precision
    enter_s, leave_s, apply_s = compact_filter_ops(ham, vol, use_pallas=False)
    ref_sphere = jax.jit(lambda u: leave_s(apply_s(enter_s(u))))(U)
    timeit("sandwich apply (highest)",
           jax.jit(apply_s), jax.jit(enter_s)(U))

    for prec in ("highest", "tensor32", "default"):
        enter, leave, apply_c = compact_filter_ops(
            ham, vol, precision=prec, use_pallas=True)
        X = jax.jit(enter)(U)
        # round-trip identity: leave(enter(U)) == U
        rt = jax.jit(lambda u: leave(enter(u)))(U)
        rt_err = float(jnp.max(jnp.abs(rt - U)))
        got = jax.jit(lambda u: leave(apply_c(enter(u))))(U)
        err = float(jnp.max(jnp.abs(got - ref_sphere))
                    / (float(jnp.max(jnp.abs(ref_sphere))) + 1e-30))
        t = timeit(f"fused zmajor apply ({prec}) rt={rt_err:.1e} "
                   f"err={err:.1e}", jax.jit(apply_c), X)
        print(f"  -> {nb/t:.0f} band-applies/s", flush=True)


if __name__ == "__main__":
    main()
