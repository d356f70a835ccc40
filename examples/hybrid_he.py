"""Hartree-Fock and PBE0 for helium (exact-exchange + ACE compression)."""
import numpy as np
import dftk_tpu as dftk
from dftk_tpu.models.standard import PBE0, model_HF

lattice = np.eye(3) * 10
He = dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")
pos = [np.array([.5, .5, .5])]

for name, builder in [("HF", model_HF), ("PBE0", PBE0), ("PBE", dftk.PBE)]:
    m = builder(lattice, [He], pos, symmetries=False)
    b = dftk.PlaneWaveBasis(m, Ecut=15.0, kgrid=(1, 1, 1))
    r = dftk.self_consistent_field(b, tol=1e-8, is_converged="energy")
    print(f"{name:5s} E = {r.energies['total']:.6f} Ha")
