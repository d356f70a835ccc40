"""Analytic DFPT phonons at q != 0 (no supercells) + elastic tensor by
response (implicit SCF differentiation)."""
import numpy as np
import dftk_tpu as dftk
from dftk_tpu.response.phonon_q import phonon_modes_dfpt_q
from dftk_tpu.postprocess.elastic_response import elastic_tensor_response

a = 10.26
lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si")
model = dftk.model_DFT(lattice, [Si, Si],
                       [np.ones(3) / 8, -np.ones(3) / 8], functionals="LDA")
basis = dftk.PlaneWaveBasis(model, Ecut=8.0, kgrid=(2, 2, 2))
res = dftk.self_consistent_field(basis, tol=1e-11)

# zone-boundary phonons, straight from linear response on the unit cell
freqs, _ = phonon_modes_dfpt_q(res, [0.5, 0, 0])
print("X-point phonon frequencies (Ha):", freqs)

# elastic constants: one SCF + six (Omega+K) solves
C = elastic_tensor_response(res)
print("C11, C12, C44 (Ha/bohr^3):", C[0, 0], C[0, 1], C[3, 3])
