#!/usr/bin/env python
"""End-to-end split-SCF with full-precision vs bf16 (DEFAULT) filter.

The CheFSI filter only shapes the subspace (Rayleigh-Ritz and residuals
stay at HIGHEST), so reduced-precision filter matmuls should not move the
converged energy beyond the f32 floor.  Round-2 measured only ~7% gain
pre-compact-filter; re-measure now that the chain is placement-free.

Usage: python tools/bench_filter_prec.py  (real chip)
"""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import self_consistent_field_split

    basis = build_problem(n_rep=3, Ecut=10.0)
    # CPU f64 reference for this exact workload (tools/run_si_big.py):
    for prec in (None, "default"):
        t0 = time.time()
        res = self_consistent_field_split(
            basis, tol=2e-5, maxiter=25, n_bands=108, n_extra_bands=20,
            dtype=jnp.float32, eigensolver="chefsi",
            filter_precision=prec)
        dt = time.time() - t0
        print(f"filter_precision={str(prec):8s}: E={res['energies']['total']"
              f":.8f} n_iter={res['n_iter']} conv={res['converged']} "
              f"wall={dt:.1f}s")


if __name__ == "__main__":
    main()
