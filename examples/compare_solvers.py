"""Comparison of DFT solvers on one system (reference examples/compare_solvers.jl).

Four routes to the same ground state: density-mixing SCF, potential-mixing
SCF, direct minimization, and Newton (warm-started from a crude SCF).  All
four densities must agree.
"""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.scf.newton import newton
from dftk_tpu.scf.potential_mixing import scf_potential_mixing

a = 10.26
lattice = a / 2 * np.array([[0, 1, 1.0], [1, 0, 1], [1, 1, 0]])
Si = dftk.ElementPsp.from_symbol("Si")
positions = [np.ones(3) / 8, -np.ones(3) / 8]

model = dftk.model_DFT(lattice, [Si, Si], positions, functionals="LDA")
basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=(2, 2, 2))
tol = 1e-6

scf = dftk.self_consistent_field(basis, tol=tol)
scfv = scf_potential_mixing(basis, tol=tol)
dm = dftk.direct_minimization(basis, tol=1e-10)
# Newton needs a good starting point: two crude SCF steps (occupied bands only)
nt = newton(basis, tol=tol, scf_start_iters=2)

rho = np.asarray(scf.rho)


def drho(res):
    return float(np.linalg.norm(np.asarray(res.rho) - rho))


print(f"E_scf    = {scf.total_energy:.10f}")
print(f"E_scfv   = {scfv.total_energy:.10f}   |rho-rho_scf| = {drho(scfv):.2e}")
print(f"E_dm     = {dm.total_energy:.10f}   |rho-rho_scf| = {drho(dm):.2e}")
print(f"E_newton = {nt.total_energy:.10f}   |rho-rho_scf| = {drho(nt):.2e}")

assert abs(scfv.total_energy - scf.total_energy) < 5e-6
assert abs(dm.total_energy - scf.total_energy) < 5e-6
assert abs(nt.total_energy - scf.total_energy) < 5e-6
