"""Basic silicon LDA ground state + bands + forces (the reference's
'metallic systems'-adjacent starter example).

Run: python examples/silicon_lda.py
"""
import numpy as np
import dftk_tpu as dftk

a = 5.131570667152971
lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0]])
Si = dftk.ElementPsp.from_symbol("Si")
model = dftk.model_DFT(lattice, [Si, Si],
                       [np.ones(3) / 8, -np.ones(3) / 8], functionals="LDA")
basis = dftk.PlaneWaveBasis(model, Ecut=15.0, kgrid=(4, 4, 4))

scfres = dftk.self_consistent_field(basis, tol=1e-8)
print(f"total energy : {scfres.energies['total']:.8f} Ha")
for name, E in sorted(scfres.energies.items()):
    if name != "total":
        print(f"  {name:16s} {E: .8f}")

forces = dftk.compute_forces_cart(scfres)
print("max |force|  :", float(np.abs(np.asarray(forces)).max()), "(zero by symmetry)")

bands = dftk.compute_bands(scfres, kline_density=10)
ev = bands["eigenvalues"]
gap = ev[:, 4].min() - ev[:, :4].max()
print(f"indirect gap : {gap * 27.2114:.2f} eV (LDA underestimates)")
