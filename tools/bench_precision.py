#!/usr/bin/env python
"""Measure apply_H_split throughput at different matmul precisions (chip)."""
import json
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import dftk_tpu  # noqa: F401
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (apply_H_split, make_split_ham,
                                           prepare_split_data,
                                           total_potential_split)
    from dftk_tpu.ops.density import guess_density
    from dftk_tpu.ops.eigen.lobpcg import ortho_qr

    n_rep = int(os.environ.get("DFTK_BENCH_NREP", "3"))
    Ecut = float(os.environ.get("DFTK_BENCH_ECUT", "10"))
    nb = int(os.environ.get("DFTK_BENCH_NBANDS", "128"))

    basis = build_problem(n_rep=n_rep, Ecut=Ecut)
    model = basis.model
    sd = prepare_split_data(basis, dtype=jnp.float32)
    rho = jnp.asarray(np.asarray(jax.device_get(guess_density(basis))),
                      dtype=jnp.float32)
    V, _ = jax.jit(lambda r: total_potential_split(
        basis.terms, sd, r, model.unit_cell_volume))(rho)
    ham = make_split_ham(sd, V)

    nbr = 2 * nb
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0),
                          (basis.n_kpoints, nbr, 2 * basis.nG_max),
                          dtype=jnp.float32) * mask2[:, None, :]
    U = ortho_qr(U)
    fft_size, vol = basis.fft_size, model.unit_cell_volume

    ref = None
    for prec in [None, "high", "default"]:
        f = jax.jit(lambda h, u: apply_H_split(h, u, fft_size, vol,
                                               precision=prec))
        out = jax.block_until_ready(f(ham, U))
        if ref is None:
            ref = out
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        for _ in range(3):
            out = f(ham, out)
        jax.block_until_ready(out)
        n_iter = 20
        t0 = time.time()
        o = U
        for _ in range(n_iter):
            o = f(ham, o)
        jax.block_until_ready(o)
        dt = time.time() - t0
        value = n_iter * basis.n_kpoints * nb / dt
        print(json.dumps({"precision": str(prec),
                          "applies_per_s": round(value, 1),
                          "rel_err_vs_highest": f"{rel:.3e}"}), flush=True)


if __name__ == "__main__":
    main()
