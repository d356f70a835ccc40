"""Metallic system: aluminium with Fermi-Dirac smearing and Kerker mixing."""
import numpy as np
import dftk_tpu as dftk

a = 7.65339
lattice = np.diag([a, a, a])
Al = dftk.ElementPsp.from_symbol("Al")
positions = [[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]]

model = dftk.model_DFT(lattice, [Al] * 4, positions, functionals="LDA",
                       temperature=1e-3,
                       smearing=dftk.Smearing.FermiDirac())
basis = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(2, 2, 2))
scfres = dftk.self_consistent_field(basis, tol=1e-7,
                                    mixing=dftk.KerkerMixing())
print("E =", scfres.total_energy, " Fermi level:", scfres.epsF)
occ = scfres.occupation
print("fractional occupations present:",
      bool(np.any((occ > 1e-3) & (occ < 2 - 1e-3))))
