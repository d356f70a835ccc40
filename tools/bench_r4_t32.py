#!/usr/bin/env python
"""Validate + slope-time the XLA apply_c at highest / tensor32 / default."""
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

    enter_h, leave_h, apply_h = compact_filter_ops(ham, vol,
                                                   precision="highest")
    Xflat = jax.jit(enter_h)(U)
    ref = jax.jit(apply_h)(Xflat)
    ref_max = float(jnp.max(jnp.abs(ref))) + 1e-30

    for prec in ("highest", "tensor32", "default"):
        _, _, apply_c = compact_filter_ops(ham, vol, precision=prec)
        got = jax.jit(apply_c)(Xflat)
        err = float(jnp.max(jnp.abs(got - ref))) / ref_max
        t = report(f"XLA apply_c ({prec:8s}) err={err:.2e}", apply_c, Xflat)
        print(f"   -> {nb/t:.0f} band-applies/s", flush=True)


if __name__ == "__main__":
    main()
