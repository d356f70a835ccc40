#!/usr/bin/env python
"""Benchmark: H*Psi band-applies/sec/chip on the headline silicon workload.

Runs on whatever accelerator JAX finds (the driver runs this on one real TPU
chip); uses the split-real engine (f32, complex-free device code - the only
mode the benchmark TPU backend supports; kernels/dft_matmul.py).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "band_applies_per_s", "vs_baseline": r}

vs_baseline compares against the reference-style CPU execution measured for
the same problem: DFTK's production habitat is one CPU node; we recorded the
equivalent complex-f64 H*Psi throughput of this very workload on this
container's CPU (BASELINE_CPU_APPLIES_PER_S below).  r > 1 means the chip
beats the CPU baseline.
"""
import json
import math
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

# Complex-f64 apply throughput of the same workload (Si54, Ecut 10, 128
# bands) on this container's CPU, measured via tools/bench_cpu_baseline.py.
# Update when the workload changes.
BASELINE_CPU_APPLIES_PER_S = 63.8


def build_problem(n_rep=2, Ecut=10.0):
    """Si supercell, Gamma-point: the Si256-direction headline workload."""
    import dftk_tpu as dftk
    a = 5.131570667152971
    prim = np.array([[0.0, a, a], [a, 0.0, a], [a, a, 0.0]])
    lattice = prim * n_rep
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    atoms, positions = [], []
    base = [np.ones(3) / 8, -np.ones(3) / 8]
    for i in range(n_rep):
        for j in range(n_rep):
            for k in range(n_rep):
                for b in base:
                    atoms.append(Si)
                    positions.append((b + np.array([i, j, k])) / n_rep)
    model = dftk.model_DFT(lattice, atoms, positions,
                           functionals=["lda_x", "lda_c_vwn"],
                           symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=(1, 1, 1))
    return basis


def main_si256():
    """The BASELINE.json north-star metric as a driver-runnable case:
    DFTK_BENCH_CASE=si256 python bench.py

    Runs the two-phase Si256 flow (tools/run_si_big.py: f32 chip SCF with
    the CheFSI compact filter to a density tolerance, then an f64 CPU
    energy refinement of the converged state - variational, so the f32
    state error enters the energy only at second order) and emits ONE
    JSON line with the SCF wall-time, s/iteration, and refined energy.
    vs_baseline compares against the round-3 builder-reported 421 s wall
    for the same flow (docs/BENCHMARKS.md)."""
    import re
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    cells = os.environ.get("DFTK_BENCH_SI256_CELLS", "4 4 2").split()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "tools", "run_si_big.py")]
        + cells + ["10.0"],
        capture_output=True, text=True)
    out = proc.stdout
    sys.stderr.write(out[-4000:] + proc.stderr[-2000:])
    iters = re.findall(r"it=(\d+) E=([-\d.]+) drho=([\d.e+-]+) \[(\d+)s\]",
                       out)
    final = re.search(r"FINAL Si(\d+): E = ([-\d.]+) Ha .*converged=(\w+), "
                      r"wall = (\d+)s", out)
    refined = re.search(r"REFINED Si\d+: E = ([-\d.]+) Ha "
                        r"\(([-\d.]+) Ha/atom\)", out)
    if not final:
        print(json.dumps({"metric": "Si256 SCF wall", "value": -1.0,
                          "unit": "s", "vs_baseline": 0.0,
                          "error": "run failed; see stderr"}))
        return
    wall = float(final.group(4))
    n_it = len(iters)
    t_first = float(iters[0][3]) if iters else 0.0
    s_per_it = (wall - t_first) / max(n_it - 1, 1) if iters else 0.0
    print(json.dumps({
        "metric": f"Si{final.group(1)} Gamma Ecut=10 two-phase SCF wall "
                  f"(f32 chip CheFSI + f64 refine; converged="
                  f"{final.group(3)}, {n_it} iterations, "
                  f"{s_per_it:.1f} s/iter steady-state)",
        "value": round(wall, 1),
        "unit": "s",
        "vs_baseline": round(421.0 / wall, 3),
        "E_f32": float(final.group(2)),
        "E_refined_f64": float(refined.group(1)) if refined else None,
        "E_refined_per_atom": float(refined.group(2)) if refined else None,
        "total_wall_incl_refine": round(time.time() - t0, 1),
    }))


def main():
    import jax
    import jax.numpy as jnp
    import dftk_tpu  # noqa: F401  (sets precision policy)
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
    V, _ = jax.jit(lambda r: total_potential_split(basis.terms, sd, r,
                                                   model.unit_cell_volume))(rho)
    ham = make_split_ham(sd, V)

    # csplit band representation (production default): ONE realified
    # vector per complex band (round 1 used 2; see ops/eigen/csplit.py)
    nbr = nb
    key = jax.random.PRNGKey(0)
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(key, (basis.n_kpoints, nbr, 2 * basis.nG_max),
                          dtype=jnp.float32) * mask2[:, None, :]
    U = ortho_qr(U)

    fft_size = basis.fft_size
    vol = model.unit_cell_volume

    # Measurement design (r5, self-calibrating):
    #   * the axon tunnel has a ~27 ms fixed dispatch/fetch cost D per jit
    #     call, so a single chain reports n c + D, not the per-apply cost
    #     c.  We therefore time TWO on-device chain lengths (lax.fori_loop,
    #     one dispatch each) and report the SLOPE-derived per-apply cost
    #     (t_long - t_short)/(n_long - n_short) alongside the long-chain
    #     headline, so a chain-length change can never masquerade as a
    #     kernel speedup again (VERDICT r4 weak #1/#7).
    #   * two filter precisions are measured: "highest" (true-f32 matmuls)
    #     and "default" (1-pass bf16) - the production setting, since
    #     self_consistent_field_split now defaults filter_precision="mixed"
    #     (bf16 filter cycles + exact finish; Rayleigh-Ritz and the
    #     convergence gate always run exact).  The HEADLINE is the
    #     production bf16 chain at n=100; the f32 numbers are emitted too.
    # The chain runs the way the production CheFSI filter does (compact-
    # cube-resident, placement paid once per chain:
    # engine_split.compact_filter_ops).
    n_long = int(os.environ.get("DFTK_BENCH_CHAIN", "100"))
    n_short = max(5, n_long // 4)
    from dftk_tpu.ops.engine_split import compact_filter_ops

    def timed_chain(precision, n_iter):
        enter, leave, apply_c = compact_filter_ops(ham, vol,
                                                   precision=precision)

        def chain(h, u):
            x = enter(u)
            x = jax.lax.fori_loop(0, n_iter, lambda i, y: apply_c(y), x)
            return leave(x)

        f = jax.jit(chain)
        jax.block_until_ready(f(ham, U))           # compile + warm
        best = math.inf
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(f(ham, U))
            best = min(best, time.time() - t0)
        return best

    n_applies = basis.n_kpoints * nb               # per chain iteration
    results = {}
    for prec in ("highest", "default"):
        t_short = timed_chain(prec, n_short)
        t_long = timed_chain(prec, n_long)
        per_apply = (t_long - t_short) / ((n_long - n_short) * n_applies)
        results[prec] = dict(
            t_short=t_short, t_long=t_long,
            per_apply_us=per_apply * 1e6,
            headline=n_long * n_applies / t_long,
            dispatch_ms=(t_long - n_long * n_applies * per_apply) * 1e3)

    bf16, f32 = results["default"], results["highest"]
    value = bf16["headline"]
    print(json.dumps({
        "metric": f"HPsi band-applies/s/chip (Si{2 * n_rep**3} Gamma, "
                  f"Ecut={Ecut}, fft={fft_size}, nb={nb}, split engine, "
                  f"production bf16 filter chain n={n_long}; slope-verified "
                  f"per-apply {bf16['per_apply_us']:.2f} us bf16 / "
                  f"{f32['per_apply_us']:.2f} us f32)",
        "value": round(value, 1),
        "unit": "band_applies_per_s",
        "vs_baseline": round(value / BASELINE_CPU_APPLIES_PER_S, 3),
        "per_apply_us_bf16_slope": round(bf16["per_apply_us"], 3),
        "per_apply_us_f32_slope": round(f32["per_apply_us"], 3),
        "applies_per_s_f32_chain": round(n_long * n_applies / f32["t_long"],
                                         1),
        "dispatch_ms_est": round(bf16["dispatch_ms"], 2),
        "chain_lengths": [n_short, n_long],
    }))


if __name__ == "__main__":
    if os.environ.get("DFTK_BENCH_CASE", "").lower() == "si256":
        main_si256()
    else:
        main()
