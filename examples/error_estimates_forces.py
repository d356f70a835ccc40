"""Practical error bounds for forces (reference
examples/error_estimates_forces.jl, method CDKL2022, SIAM JSC 44 B1312).

Run SCF on a small basis, refine on a large one (refine_scfres computes the
Schur-complement first-order correction delta_psi/delta_rho), and correct
the forces with refine_forces.  The refined forces land much closer to the
fully converged reference forces than the raw small-basis forces.
"""
import numpy as np

import dftk_tpu as dftk

# displaced-Si setup (the reference uses displaced TiO2; same flow)
a = 10.26
lattice = a / 2 * np.array([[0, 1, 1.0], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si")
positions = [np.ones(3) / 8 + np.array([-0.022, 0.028, 0.035]) / 4,
             -np.ones(3) / 8]
model = dftk.model_DFT(lattice, [Si, Si], positions, functionals="LDA",
                       symmetries=False)
kgrid = (1, 1, 1)
Ecut, Ecut_ref = 8.0, 25.0
tol = 1e-7

# solution on the small basis, and its first-order refinement toward Ecut_ref
scfres = dftk.self_consistent_field(
    dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=kgrid), tol=tol)
refinement = dftk.refine_scfres(scfres, Ecut_ref)

f = np.asarray(dftk.compute_forces(scfres))
ref_forces = dftk.refine_forces(refinement)
f_refined = np.asarray(ref_forces["F_refined"])
dF_estimate = f_refined - np.asarray(ref_forces["F"])

# reference forces from a full SCF at Ecut_ref
scfres_ref = dftk.self_consistent_field(
    dftk.PlaneWaveBasis(model, Ecut=Ecut_ref, kgrid=kgrid), tol=tol)
f_ref = np.asarray(dftk.compute_forces(scfres_ref))

relerr = lambda x: np.linalg.norm(x - f_ref) / np.linalg.norm(f_ref)
print(f"F(P)           rel. error: {relerr(f):.2e}")
print(f"F(P) refined   rel. error: {relerr(f_refined):.2e}")
print("practical error estimate |dF| =", np.linalg.norm(dF_estimate))
assert relerr(f_refined) < relerr(f)
