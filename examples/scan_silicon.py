"""Meta-GGA: silicon with the SCAN functional."""
import numpy as np
import dftk_tpu as dftk

a = 10.26
lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
model = dftk.model_DFT(lattice, [Si, Si],
                       [np.ones(3) / 8, -np.ones(3) / 8], functionals="SCAN")
basis = dftk.PlaneWaveBasis(model, Ecut=15.0, kgrid=(3, 3, 3))
scfres = dftk.self_consistent_field(basis, tol=1e-8, is_converged="energy")
print("SCAN E =", scfres.total_energy)
