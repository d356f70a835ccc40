"""Toy geometry optimization using the calculator interface:
relax the Si-Si bond by steepest descent on autodiff forces."""
import numpy as np
import dftk_tpu as dftk
from dftk_tpu.external.calculator import DFTCalculator

a = 10.26
lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si")

def builder(lat, positions):
    return dftk.model_DFT(lat, [Si, Si], positions, functionals="LDA",
                          symmetries=False)

calc = DFTCalculator(builder, Ecut=10.0, kgrid=(2, 2, 2),
                     scf_kwargs=dict(tol=1e-8))
pos = [np.array([0.13, 0.125, 0.12]), -np.ones(3) / 8]  # perturbed start
for step in range(6):
    F = calc.forces(lattice, pos)
    fmax = np.abs(F).max()
    print(f"step {step}: E = {calc.potential_energy(lattice, pos):.8f} "
          f"max|F| = {fmax:.2e}")
    if fmax < 1e-4:
        break
    pos = [p + 2.0 * np.linalg.inv(lattice) @ f for p, f in zip(pos, F)]
