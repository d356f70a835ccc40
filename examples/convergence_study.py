"""Convergence study: total energy vs Ecut and vs k-grid density.

Mirrors the reference examples/convergence_study.jl: sweep the two
discretisation knobs of a plane-wave calculation on platinum-free
silicon, watching the total energy converge monotonically-in-practice
toward the dense-limit value.
"""
import numpy as np

import dftk_tpu as dftk


def run(Ecut, nk):
    a = 5.131570667152971
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0.0]])
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    model = dftk.model_DFT(lattice, [Si, Si],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=(nk, nk, nk))
    return dftk.self_consistent_field(basis, tol=1e-7,
                                      is_converged="energy").total_energy


def main():
    print("Ecut convergence (kgrid 2x2x2):")
    Ecuts = [5.0, 8.0, 12.0, 16.0]
    E_ecut = [run(E, 2) for E in Ecuts]
    for E, val in zip(Ecuts, E_ecut):
        print(f"  Ecut = {E:5.1f}  E = {val:.8f}")
    # variational: E decreases with Ecut, increments shrink
    assert E_ecut[1] < E_ecut[0] and E_ecut[2] < E_ecut[1]
    assert abs(E_ecut[3] - E_ecut[2]) < abs(E_ecut[1] - E_ecut[0])

    print("k-grid convergence (Ecut 8):")
    nks = [1, 2, 3]
    E_k = [run(8.0, n) for n in nks]
    for n, val in zip(nks, E_k):
        print(f"  kgrid = {n}^3    E = {val:.8f}")
    assert abs(E_k[2] - E_k[1]) < abs(E_k[1] - E_k[0])
    print(f"converged estimate: E = {E_k[2]:.6f} "
          f"(k-increment {abs(E_k[2] - E_k[1]):.1e})")
    return E_ecut, E_k


if __name__ == "__main__":
    main()
