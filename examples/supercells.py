"""Metallic supercells: SCF iteration count vs system size
(reference examples/supercells.jl).

LdosMixing keeps the number of SCF iterations roughly constant as an
aluminium supercell grows, while SimpleMixing degrades (charge sloshing) --
the point of black-box inhomogeneous preconditioning (Herbst & Levitt 2021).
"""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.supercell import create_supercell


def aluminium_setup(repeat=1, Ecut=7.0, kgrid=(2, 2, 2)):
    a = 7.65339
    lattice = np.diag([a, a, a])
    Al = dftk.ElementPsp.from_symbol("Al")
    positions = [np.array(p) for p in
                 [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]]]
    sc = create_supercell(lattice, [Al] * 4, positions, (repeat, 1, 1))
    lattice, atoms, positions = sc["lattice"], sc["atoms"], sc["positions"]
    # symmetries off, as in the reference: tiny cells are otherwise too
    # symmetric to show the instability
    model = dftk.model_DFT(lattice, atoms, positions, functionals="LDA",
                           temperature=1e-3, symmetries=False)
    return dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=kgrid)


def n_iterations(repeat, mixing):
    res = dftk.self_consistent_field(aluminium_setup(repeat), tol=1e-4,
                                     mixing=mixing)
    return len(res.history_Etot)


if __name__ == "__main__":
    iters_ldos = [n_iterations(r, dftk.LdosMixing()) for r in (1, 2, 4)]
    iters_simple = [n_iterations(r, dftk.SimpleMixing()) for r in (1, 2, 4)]
    print("repeat:            1  2  4")
    print("LdosMixing iters:  ", iters_ldos)
    print("SimpleMixing iters:", iters_simple)
    # LdosMixing stays flat; SimpleMixing grows with the cell
    assert iters_ldos[-1] <= iters_ldos[0] + 4
