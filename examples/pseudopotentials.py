"""Pseudopotential families: analytic HGH vs numeric UPF.

Mirrors the reference examples/pseudopotentials.jl: run the same carbon
(diamond) calculation with (a) the analytic GTH/HGH pseudopotential and
(b) a numeric UPF (pseudo-atomic data on a radial grid, Hankel-
transformed on load).  Same element, different psp generations — close
but not identical energies, and the UPF additionally carries pseudo-
atomic wavefunctions (used for PDOS projections and DFT+U manifolds).
"""
import pathlib

import numpy as np

import dftk_tpu as dftk

UPF = str(pathlib.Path(__file__).resolve().parent.parent
          / "tests" / "data" / "pseudos" / "C_m.upf")


def run(element):
    a = 6.74263
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0.0]]) / 2
    model = dftk.model_DFT(lattice, [element, element],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals="PBE")
    basis = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(2, 2, 2))
    return dftk.self_consistent_field(basis, tol=1e-7,
                                      is_converged="energy")


def main():
    C_hgh = dftk.ElementPsp.from_symbol("C", psp="pbe/c-q4")
    C_upf = dftk.ElementPsp.from_symbol("C", psp=UPF)
    labels = [l for ls in getattr(C_upf.psp, "pswfc_labels", ()) for l in ls]
    print("UPF pseudo-atomic wavefunctions:", labels)

    res_h = run(C_hgh)
    res_u = run(C_upf)
    print(f"HGH (GTH pbe/c-q4): E = {res_h.total_energy:.8f}")
    print(f"UPF (vendored):     E = {res_u.total_energy:.8f}")
    dE = abs(res_h.total_energy - res_u.total_energy)
    print(f"families differ by {dE:.2e} Ha (different generations: "
          "expected non-zero, same ballpark)")
    assert dE < 0.5
    return res_h, res_u


if __name__ == "__main__":
    main()
