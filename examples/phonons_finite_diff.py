"""Gamma-point phonons of silicon by finite differences of autodiff forces."""
import numpy as np
import dftk_tpu as dftk
from dftk_tpu.postprocess.phonon import (HARTREE_TO_CM1,
                                         phonon_modes_finite_diff)

a = 10.26
lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si")

def make_basis(positions):
    m = dftk.model_DFT(lattice, [Si, Si], positions, functionals="LDA",
                       symmetries=False)
    return dftk.PlaneWaveBasis(m, Ecut=10.0, kgrid=(2, 2, 2))

pos0 = [np.ones(3) / 8, -np.ones(3) / 8]
freqs, _ = phonon_modes_finite_diff(make_basis, pos0, [Si, Si],
                                    scf_kwargs=dict(tol=1e-9))
print("phonon frequencies (cm^-1):",
      np.round(freqs * HARTREE_TO_CM1, 1))
print("(3 acoustic modes ~ 0, optical modes ~ 500 cm^-1 for Si)")
