"""Gross-Pitaevskii equation via the LocalNonlinearity term
(reference examples/gross_pitaevskii.jl): one particle with quartic
self-interaction in a box."""
import numpy as np
import jax.numpy as jnp
import dftk_tpu as dftk

lattice = np.diag([10.0, 10.0, 10.0])
def Vext(r_cart):
    # harmonic confinement around the box center
    r2 = np.sum((r_cart - 5.0) ** 2, axis=-1)
    return 0.5 * r2

C = 1.0  # interaction strength
model = dftk.Model(
    lattice=lattice, atoms=[], positions=[], n_electrons=1,
    spin_polarization="spinless",
    term_types=[dftk.Kinetic(),
                dftk.ExternalFromReal(Vext),
                dftk.LocalNonlinearity(lambda rho: C * rho ** 2)],
    symmetries=False)
basis = dftk.PlaneWaveBasis(model, Ecut=20.0, kgrid=(1, 1, 1))
scfres = dftk.self_consistent_field(basis, tol=1e-8)
print("GP energy terms:", scfres.energies)
