"""Phonons two ways: analytic DFPT at Gamma, and omega(q) along the fcc
path from supercell force constants."""
import numpy as np
import dftk_tpu as dftk
from dftk_tpu.postprocess.phonon import (HARTREE_TO_CM1,
                                         compute_force_constants,
                                         phonon_band_structure)
from dftk_tpu.response.phonon_dfpt import phonon_modes_dfpt_gamma

a = 5.131570667152971
lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0]])
Si = dftk.ElementPsp.from_symbol("Si")
model = dftk.model_DFT(lattice, [Si, Si],
                       [np.ones(3) / 8, -np.ones(3) / 8], functionals="LDA")

# DFPT at Gamma (analytic, one Sternheimer solve per displacement)
basis = dftk.PlaneWaveBasis(model, Ecut=8.0, kgrid=(2, 2, 2))
scfres = dftk.self_consistent_field(basis, tol=1e-12)
freqs, _ = phonon_modes_dfpt_gamma(scfres)
print("DFPT Gamma frequencies (cm^-1):",
      np.round(freqs * HARTREE_TO_CM1, 1))

# omega(q) from a 2x2x2 supercell (exact at commensurate q)
fc = compute_force_constants(model, Ecut=8.0, supercell_size=(2, 2, 2),
                             scf_kwargs=dict(tol=1e-9))
bs = phonon_band_structure(fc, kline_density=10)
print("q-path points:", len(bs["qpath"].kcoords),
      " max omega:", round(float(bs["frequencies"].max()) * HARTREE_TO_CM1, 1),
      "cm^-1")
