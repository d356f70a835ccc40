#!/usr/bin/env python
"""Correctness + speed of the compact-resident filter apply (real chip)."""
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
    from dftk_tpu.ops.engine_split import (apply_H_split, compact_filter_ops,
                                           make_split_ham, prepare_split_data,
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
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0),
                          (1, nb, 2 * basis.nG_max), jnp.float32) \
        * mask2[:, None, :]
    U = ortho_qr(U)

    enter, leave, apply_c = compact_filter_ops(ham, vol)
    _, _, apply_cd = compact_filter_ops(ham, vol, precision="default")

    y_ref = jax.jit(lambda u: apply_H_split(ham, u, basis.fft_size, vol))(U)
    y_cmp = jax.jit(lambda u: leave(apply_c(enter(u))))(U)
    err = float(jnp.abs(y_ref - y_cmp).max() / jnp.abs(y_ref).max())
    print("apply rel err compact vs sphere:", err)

    n_iter = 20

    def chain_sphere(u):
        return jax.lax.fori_loop(
            0, n_iter, lambda i, x: apply_H_split(ham, x, basis.fft_size,
                                                  vol), u)

    def chain_compact(u):
        x = enter(u)
        x = jax.lax.fori_loop(0, n_iter, lambda i, y: apply_c(y), x)
        return leave(x)

    def chain_compact_bf16(u):
        x = enter(u)
        x = jax.lax.fori_loop(0, n_iter, lambda i, y: apply_cd(y), x)
        return leave(x)

    for name, fn in [("sphere chain", chain_sphere),
                     ("compact chain", chain_compact),
                     ("compact bf16", chain_compact_bf16)]:
        f = jax.jit(fn)
        jax.block_until_ready(f(U))
        t0 = time.time()
        jax.block_until_ready(f(U))
        dt = time.time() - t0
        print(f"{name:14s}: {dt/n_iter*1e3:7.2f} ms/apply  "
              f"{n_iter*nb/dt:9.0f} band-applies/s")


if __name__ == "__main__":
    main()
