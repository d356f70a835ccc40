"""Round-2 functionals: r2SCAN meta-GGA and the HSE06 screened hybrid."""
import numpy as np
import dftk_tpu as dftk

a = 10.26
lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si", psp="pbe/si-q4")
pos = [np.ones(3) / 8, -np.ones(3) / 8]

# r2SCAN: just a functional-set name
model = dftk.model_DFT(lattice, [Si, Si], pos, functionals="r2SCAN")
basis = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(2, 2, 2))
res = dftk.self_consistent_field(basis, tol=1e-7)
print("r2SCAN total energy:", res.total_energy, "Ha")

# HSE06: erfc-screened hybrid (Gamma-only exchange, like the reference)
model = dftk.HSE06(lattice, [Si, Si], pos)
basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(1, 1, 1))
res = dftk.self_consistent_field(basis, tol=1e-7, maxiter=60)
print("HSE06 total energy:", res.total_energy, "Ha")
