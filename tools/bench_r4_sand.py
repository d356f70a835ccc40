#!/usr/bin/env python
"""Slope-timed sandwich (use_pallas=False) apply at all precisions."""
import os, sys
os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from axon_timing import report

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
    ref = None
    for prec in ("highest", "tensor32", "default"):
        enter, leave, apply_c = compact_filter_ops(
            ham, vol, precision=prec, use_pallas=False)
        X = jax.jit(enter)(U)
        got = jax.jit(lambda u: leave(apply_c(enter(u))))(U)
        if ref is None:
            ref = got
        err = float(jnp.max(jnp.abs(got - ref))
                    / (float(jnp.max(jnp.abs(ref))) + 1e-30))
        dt = report(f"sandwich apply ({prec}) err={err:.1e}", apply_c, X)
        print(f"  -> {nb/dt:.0f} band-applies/s (slope)", flush=True)

if __name__ == "__main__":
    main()
