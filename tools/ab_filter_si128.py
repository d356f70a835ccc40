"""Chip A/B: end-to-end SCF s/iter at Si128 with mixed(bf16) vs exact(f32)
Chebyshev filter.

AB_FILTER_r05.json (Si64) recorded the honest caveat that at 256 electrons
the SCF wall is NOT filter-dominated (s/iter unchanged there); this probe
measures the size where the production bf16 lever pays END-TO-END, one size
up (Si128, 512 electrons, 288 bands).  Steady-state s/iter is taken from
the callback timestamps of iterations 3..N (iteration 1 carries the jit
compile; 2 can carry autopilot re-tuning), identical seeds/schedules, only
filter_precision differs.

Usage: python tools/ab_filter_si128.py [n_iter]  (default 8)
"""
import json
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(filter_precision, n_iter):
    import dftk_tpu as dftk
    from dftk_tpu.supercell import create_supercell
    from dftk_tpu.ops.engine_split import self_consistent_field_split

    a = 10.263141334305942
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    conv_pos = [np.array(p) for p in
                [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
                 [.25, .25, .25], [.75, .75, .25], [.75, .25, .75],
                 [.25, .75, .75]]]
    sc = create_supercell(np.eye(3) * a, [Si] * 8, conv_pos, (4, 2, 2))
    model = dftk.model_DFT(sc["lattice"], sc["atoms"], sc["positions"],
                           functionals=["lda_x", "lda_c_vwn"],
                           symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(1, 1, 1))
    natoms = len(model.atoms)
    stamps, energies = [], []

    def cb(info):
        stamps.append(time.time())
        energies.append(info["E"])
        print(f"  [{filter_precision}] it={info['n_iter']} E={info['E']:.6f} "
              f"drho={info['drho']:.2e}", flush=True)

    t0 = time.time()
    res = self_consistent_field_split(
        basis, tol=1e-12, maxiter=n_iter, n_bands=natoms * 2,
        n_extra_bands=32, eigensolver="chefsi", chebyshev_degree=10,
        chefsi_cycles=2, band_chunk=256, is_converged="density",
        filter_precision=filter_precision, callback=cb)
    wall = time.time() - t0
    # steady-state: median gap between consecutive callbacks from it>=3
    gaps = np.diff(stamps)[2:]
    return dict(precision=filter_precision, natoms=natoms,
                wall_s=round(wall, 1),
                s_per_iter_steady=round(float(np.median(gaps)), 3),
                E_last=float(energies[-1]), n_iter=len(stamps))


if __name__ == "__main__":
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = [run("mixed", n_iter), run("highest", n_iter)]
    ratio = out[1]["s_per_iter_steady"] / out[0]["s_per_iter_steady"]
    print(json.dumps({"case": "Si128 Gamma Ecut=10 nb=288 chip SCF A/B",
                      "runs": out,
                      "exact_over_mixed_s_per_iter": round(ratio, 3)}))
