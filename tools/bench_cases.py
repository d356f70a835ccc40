#!/usr/bin/env python
"""The reference's benchmark suite cases (DFTK benchmark/cases/*) as
runnable scripts: silicon, aluminium12, Al27-rattled, SrVO3.

Usage: python tools/bench_cases.py <case> [quick]
  case  : silicon | aluminium12 | al27 | srvo3 | gaas_surface
  quick : reduce Ecut/kgrid for a fast smoke run

Prints one JSON line per phase (scf_3steps / scf_full / forces), mirroring
the reference's timed phases (benchmark/cases/silicon.jl etc.).
On the TPU chip the split-real engine runs the SCF; elsewhere the complex
engine is used.
"""
import json
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def case_silicon(quick):
    import dftk_tpu as dftk
    a = 10.26
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    model = dftk.model_DFT(lattice, [Si, Si],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals="LDA")
    Ecut, kgrid = (15.0, (4, 4, 4)) if quick else (35.0, (8, 8, 8))
    return model, Ecut, kgrid


def case_aluminium12(quick):
    import dftk_tpu as dftk
    a = 7.65339
    # 1x2x2 supercell of conventional fcc Al: 12 atoms ... use 3x2x2 of the
    # primitive 1-atom cell x4 conventional = 12
    conv = np.eye(3) * a
    pos1 = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]]
    lattice = conv @ np.diag([1, 1, 3])
    Al = dftk.ElementPsp.from_symbol("Al", psp="pbe/al-q3")
    atoms, positions = [], []
    for k in range(3):
        for p in pos1:
            atoms.append(Al)
            positions.append(np.array([p[0], p[1], (p[2] + k) / 3]))
    model = dftk.model_DFT(lattice, atoms, positions, functionals="PBE",
                           temperature=1e-3,
                           smearing=dftk.Smearing.Gaussian())
    Ecut, kgrid = (10.0, (2, 2, 1)) if quick else (30.0, (7, 7, 3))
    return model, Ecut, kgrid


def case_al27(quick):
    """27-atom rattled Al supercell (disordered metal; fixed seed)."""
    import dftk_tpu as dftk
    a = 7.65339
    prim = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    lattice = prim * 3
    rng = np.random.default_rng(42)
    Al = dftk.ElementPsp.from_symbol("Al", psp="pbe/al-q3")
    atoms, positions = [], []
    for i in range(3):
        for j in range(3):
            for k in range(3):
                atoms.append(Al)
                base = (np.array([i, j, k], float)
                        + rng.normal(scale=0.02, size=3)) / 3
                positions.append(base)
    model = dftk.model_DFT(lattice, atoms, positions, functionals="PBE",
                           temperature=1e-3,
                           smearing=dftk.Smearing.Gaussian(),
                           symmetries=False)
    Ecut, kgrid = (10.0, (1, 1, 1)) if quick else (30.0, (2, 2, 2))
    return model, Ecut, kgrid


def case_srvo3(quick):
    import dftk_tpu as dftk
    a = 7.26
    lattice = np.eye(3) * a
    Sr = dftk.ElementPsp.from_symbol("Sr", psp="lda/sr-q10")
    V = dftk.ElementPsp.from_symbol("V", psp="lda/v-q5")
    O = dftk.ElementPsp.from_symbol("O", psp="lda/o-q6")
    atoms = [Sr, V, O, O, O]
    positions = [np.array([.5, .5, .5]), np.zeros(3),
                 np.array([.5, 0, 0]), np.array([0, .5, 0]),
                 np.array([0, 0, .5])]
    model = dftk.model_DFT(lattice, atoms, positions, functionals="LDA",
                           temperature=1e-2,
                           smearing=dftk.Smearing.Gaussian())
    Ecut, kgrid = (20.0, (3, 3, 3)) if quick else (72.0, (10, 10, 10))
    return model, Ecut, kgrid


def case_gaas_surface(quick):
    """GaAs (110) surface slab + vacuum (BASELINE configs[3]; reference
    examples/gaas_surface.jl built with ASE, here ASE-free)."""
    import dftk_tpu as dftk
    from dftk_tpu.external.structure import build_model, build_surface_110
    if quick:
        s = build_surface_110(n_layers=2, n_vacuum=4)
        Ecut, kgrid = 5.0, (4, 4, 1)
    else:
        # the example's "more interesting settings"
        s = build_surface_110(n_layers=20, n_vacuum=20)
        Ecut, kgrid = 15.0, (4, 4, 1)
    model = build_model(s, functionals="PBE", psp_family="pbe",
                        temperature=1e-3,
                        smearing=dftk.Smearing.Gaussian())
    return model, Ecut, kgrid


CASES = {"silicon": case_silicon, "aluminium12": case_aluminium12,
         "al27": case_al27, "srvo3": case_srvo3,
         "gaas_surface": case_gaas_surface}


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "silicon"
    quick = len(sys.argv) > 2 and sys.argv[2] == "quick"
    import jax
    import dftk_tpu as dftk

    model, Ecut, kgrid = CASES[case](quick)
    on_tpu = jax.devices()[0].platform not in ("cpu",)

    t0 = time.time()
    basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=kgrid)
    setup_s = time.time() - t0
    print(json.dumps({"case": case, "phase": "setup",
                      "fft": list(basis.fft_size), "nk": basis.n_kpoints,
                      "nG": int(basis.nG_max), "seconds": round(setup_s, 2)}),
          flush=True)

    def run_scf(maxiter, tol=1e-8):
        if on_tpu:
            from dftk_tpu.ops.engine_split import self_consistent_field_split
            r = self_consistent_field_split(basis, tol=tol, maxiter=maxiter,
                                            is_converged="energy")
            return r["energies"]["total"], r["n_iter"], r.get("converged")
        r = dftk.self_consistent_field(basis, tol=tol, maxiter=maxiter,
                                       is_converged="energy")
        return r.energies["total"], r.n_iter, r

    # scf_3steps (compile + 3 iterations), like the reference's warm phase
    t0 = time.time()
    E3, _, _ = run_scf(3, tol=0.0 if on_tpu else 1e-30)
    print(json.dumps({"case": case, "phase": "scf_3steps",
                      "seconds": round(time.time() - t0, 2)}), flush=True)

    t0 = time.time()
    E, n_iter, r = run_scf(60)
    scf_s = time.time() - t0
    print(json.dumps({"case": case, "phase": "scf_full", "E": E,
                      "n_iter": n_iter, "seconds": round(scf_s, 2)}),
          flush=True)

    if not on_tpu and not isinstance(r, tuple):
        t0 = time.time()
        f = dftk.compute_forces_cart(r)
        print(json.dumps({"case": case, "phase": "forces",
                          "max_force": float(np.abs(np.asarray(f)).max()),
                          "seconds": round(time.time() - t0, 2)}), flush=True)


if __name__ == "__main__":
    main()
