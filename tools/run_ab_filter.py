"""A/B artifact: mixed (bf16) vs highest (f32) Chebyshev filter on chip.

Runs the Si64-class two-phase flow (tools/run_si_big.py) twice on the real
TPU chip - once with the production default filter_precision="mixed"
(1-pass bf16 filter cycles + exact finish) and once all-exact ("highest") -
and records both refined f64 energies and walls as ONE json artifact
(AB_FILTER_r{N}.json).  The bf16 filter only shapes the eigensolver
subspace; Rayleigh-Ritz, residuals and the convergence gate run on the
exact apply, so the refined energies must agree to the f32 state noise
(measured ~1e-8 Ha/atom).

Usage: python tools/run_ab_filter.py [cells_x cells_y cells_z] [Ecut] [out]
"""
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(prec, cells, ecut):
    env = dict(os.environ, DFTK_FILTER_PRECISION=prec,
               DFTK_STATE_PATH=f"/tmp/si_ab_{prec}.npz")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "run_si_big.py")]
        + [str(c) for c in cells] + [str(ecut)],
        capture_output=True, text=True, env=env)
    out = proc.stdout
    sys.stderr.write(f"--- filter_precision={prec} ---\n" + out[-3000:]
                     + proc.stderr[-1500:])
    final = re.search(r"FINAL Si(\d+): E = ([-\d.]+) Ha .*converged=(\w+), "
                      r"wall = (\d+)s", out)
    refined = re.search(r"REFINED Si\d+: E = ([-\d.]+) Ha "
                        r"\(([-\d.]+) Ha/atom\)", out)
    iters = re.findall(r"it=(\d+) E=[-\d.]+ drho=[\d.e+-]+ \[(\d+)s\]", out)
    if not final:
        return {"error": "run failed", "wall_total_s": time.time() - t0}
    # compile-free per-iteration time: the first iteration's timestamp
    # absorbs jit compilation (hundreds of seconds, cache-dependent), so
    # the honest kernel-speed comparison is the slope over iterations 2..n
    s_per_iter = None
    if len(iters) >= 3:
        t2, tn = float(iters[1][1]), float(iters[-1][1])
        s_per_iter = (tn - t2) / (len(iters) - 2)
    return {
        "filter_precision": prec,
        "E_f32_chip": float(final.group(2)),
        "E_refined_f64": float(refined.group(1)) if refined else None,
        "E_refined_per_atom": float(refined.group(2)) if refined else None,
        "converged": final.group(3) == "True",
        "n_iterations": len(iters),
        "scf_wall_s": float(final.group(4)),
        "s_per_iter_post_compile": s_per_iter,
        "natoms": int(final.group(1)),
    }


def main():
    cells = tuple(int(x) for x in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (2, 2, 2)
    ecut = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    out_path = sys.argv[5] if len(sys.argv) > 5 else \
        os.path.join(os.path.dirname(HERE), "AB_FILTER_r05.json")
    a = run_one("highest", cells, ecut)
    b = run_one("mixed", cells, ecut)
    delta = (abs(a["E_refined_f64"] - b["E_refined_f64"])
             if a.get("E_refined_f64") is not None
             and b.get("E_refined_f64") is not None else None)
    doc = {
        "case": f"Si{a.get('natoms', '?')} Gamma Ecut={ecut} two-phase "
                "(f32 chip CheFSI + f64 CPU refine)",
        "highest": a, "mixed": b,
        "refined_energy_delta_Ha": delta,
        "refined_energy_delta_Ha_per_atom":
            delta / a["natoms"] if delta is not None else None,
        "speedup_scf_wall": (a["scf_wall_s"] / b["scf_wall_s"]
                             if a.get("scf_wall_s") and b.get("scf_wall_s")
                             else None),
        # walls include jit compilation (different programs, different
        # compile costs) - the kernel-speed comparison is this one:
        "speedup_s_per_iter": (
            a["s_per_iter_post_compile"] / b["s_per_iter_post_compile"]
            if a.get("s_per_iter_post_compile")
            and b.get("s_per_iter_post_compile") else None),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
