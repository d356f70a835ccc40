"""Silicon LDA ground state: the canonical quickstart.

Counterpart of the reference's README quickstart / examples/basics: 2-atom
silicon diamond cell, LDA, Monkhorst-Pack grid, converged SCF with energy
breakdown, forces and stresses from autodiff.
"""
import numpy as np
import dftk_tpu as dftk

a = 10.26  # silicon lattice constant, bohr
lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si")       # built-in GTH/HGH LDA psp
atoms = [Si, Si]
positions = [np.ones(3) / 8, -np.ones(3) / 8]

model = dftk.model_DFT(lattice, atoms, positions, functionals="LDA")
basis = dftk.PlaneWaveBasis(model, Ecut=15.0, kgrid=(4, 4, 4))
scfres = dftk.self_consistent_field(basis, tol=1e-8)

print("energies:")
for name, val in scfres.energies.items():
    print(f"  {name:<16s} {val: .10f}")
print("forces (Cartesian):\n", dftk.compute_forces_cart(scfres))
print("stress (Ha/bohr^3):\n", dftk.compute_stresses_cart(scfres))
