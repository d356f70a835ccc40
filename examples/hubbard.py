"""DFT+U: Hubbard correction on pseudo-atomic orbital manifolds.

Mirrors the reference examples/hubbard.jl: add a +U term on selected
atomic manifolds (here Si 3p, for a fast demonstration; the physics
machinery — occupation matrices n^{I}_{mm'}, the rotationally invariant
Dudarev functional, symmetrization — is in ops/hubbard.py).  U > 0
penalises fractional manifold occupation and shifts the band energies.

Needs a UPF pseudopotential with pseudo-atomic wavefunctions (the
vendored test UPF); HGH files carry no pswfcs.
"""
import pathlib

import numpy as np

import dftk_tpu as dftk

UPF = str(pathlib.Path(__file__).resolve().parent.parent
          / "tests" / "data" / "pseudos" / "C_m.upf")


def main():
    a = 5.131570667152971
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0.0]])
    C = dftk.ElementPsp.from_symbol("C", psp=UPF)
    positions = [np.ones(3) / 8, -np.ones(3) / 8]

    results = {}
    for U in (0.0, 0.15):
        extra = []
        if U > 0:
            mfs = (dftk.HubbardManifold(atom_index=0, l=1, U=U),
                   dftk.HubbardManifold(atom_index=1, l=1, U=U))
            extra = [dftk.Hubbard(manifolds=mfs)]
        model = dftk.model_DFT(lattice, [C, C], positions,
                               functionals="PBE", extra_terms=extra)
        basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(2, 2, 2))
        res = dftk.self_consistent_field(basis, tol=1e-7,
                                         is_converged="energy")
        results[U] = res
        e_hub = res.energies.get("Hubbard", 0.0)
        print(f"U = {U:4.2f} Ha:  E = {res.total_energy:.8f}  "
              f"E_Hubbard = {float(e_hub):.8f}")

    # the +U energy contribution is positive for partially-filled p
    assert float(results[0.15].energies["Hubbard"]) > 0
    return results


if __name__ == "__main__":
    main()
