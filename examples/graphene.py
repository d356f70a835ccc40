"""Graphene band structure (reference examples/graphene.jl).

A 2D material in a 3D cell: hexagonal lattice with a large vacuum along z,
PBE with smearing, and a custom in-plane k-path (G-M-K-G) through the
Brillouin zone passed to compute_bands via `paths=` -- band structures of
2D systems use in-plane points only.
"""
import numpy as np

import dftk_tpu as dftk

L = 20.0          # height of the simulation box (vacuum)
a = 4.66          # lattice constant
lattice = np.array([[a / 2, a / 2, 0.0],
                    [-a * np.sqrt(3) / 2, a * np.sqrt(3) / 2, 0.0],
                    [0.0, 0.0, L]]).T
C = dftk.ElementPsp.from_symbol("C", family="pbe")
C1 = np.array([1 / 3, -1 / 3, 0.0])
positions = [C1, -C1]

model = dftk.model_DFT(lattice, [C, C], positions, functionals="PBE",
                       temperature=1e-3)
basis = dftk.PlaneWaveBasis(model, Ecut=15.0, kgrid=(6, 6, 1))
scfres = dftk.self_consistent_field(basis, tol=1e-6)
print("E =", scfres.total_energy, " epsF =", scfres.epsF)

# in-plane path for the 2D Brillouin zone
bands = dftk.compute_bands(scfres, kline_density=10,
                           paths=["G", "M", "K", "G"])
ev = np.asarray(bands["eigenvalues"])
epsF = float(scfres.epsF)

# graphene is a semimetal: valence and conduction bands touch at K
kcoords = np.asarray(bands["kcoords"])
iK = int(np.argmin(np.linalg.norm(kcoords - np.array([1 / 3, 1 / 3, 0]),
                                  axis=1)))
n_occ = 4  # 8 valence electrons, spin-paired
gap_at_K = ev[iK, n_occ] - ev[iK, n_occ - 1]
print(f"pi/pi* separation at K: {gap_at_K:.4f} Ha (Dirac point -> ~0)")
assert gap_at_K < 0.02
