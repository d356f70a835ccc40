"""Dipole polarizability of helium by linear response (Dyson/Sternheimer)
vs finite difference of the dipole in a field."""
import numpy as np
import dftk_tpu as dftk

lattice = np.eye(3) * 10
He = dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")
m = dftk.model_DFT(lattice, [He], [np.array([.5, .5, .5])],
                   functionals="LDA", symmetries=False)
b = dftk.PlaneWaveBasis(m, Ecut=15.0, kgrid=(1, 1, 1))
res = dftk.self_consistent_field(b, tol=1e-10)
alpha = dftk.compute_polarizability(res)
print(f"alpha(He, LDA) = {alpha:.4f} a.u.")
