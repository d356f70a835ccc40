"""Dipole polarizability of a helium atom: DFPT vs finite differences."""
import numpy as np
import dftk_tpu as dftk

lattice = np.eye(3) * 10.0
He = dftk.ElementPsp.from_symbol("He")
model = dftk.model_DFT(lattice, [He], [np.array([.5, .5, .5])],
                       functionals="LDA", symmetries=False)
basis = dftk.PlaneWaveBasis(model, Ecut=20.0, kgrid=(1, 1, 1))
scfres = dftk.self_consistent_field(basis, tol=1e-10)
alpha = dftk.compute_polarizability(scfres, direction=2)
print("He polarizability:", alpha, "bohr^3 (literature LDA ~ 1.65)")
