"""Band structure along the fcc high-symmetry path + density of states."""
import numpy as np
import dftk_tpu as dftk
from dftk_tpu.postprocess.dos import plot_dos_data

a = 10.26
lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si")
model = dftk.model_DFT(lattice, [Si, Si],
                       [np.ones(3) / 8, -np.ones(3) / 8], functionals="LDA")
basis = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(4, 4, 4))
scfres = dftk.self_consistent_field(basis, tol=1e-7)

bands = dftk.compute_bands(scfres, n_bands=8, kline_density=12)
print("k-path:", {i: l for i, l in sorted(bands["kpath"].labels.items())})
gap = bands["eigenvalues"][:, 4].min() - bands["eigenvalues"][:, 3].max()
print("indirect gap estimate:", gap, "Ha")

eps, dos = plot_dos_data(basis, scfres.eigenvalues, n_points=100)
print("DOS at Fermi level ~", np.interp(scfres.epsF, eps, dos))
