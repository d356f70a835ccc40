"""1-particle Gross-Pitaevskii equation in a harmonic trap (the
reference's 'custom potentials / nonlinearities' example): no atoms, an
external potential term + a local rho^2 nonlinearity."""
import numpy as np
import dftk_tpu as dftk

lattice = np.eye(3) * 10.0

def pot(r_cart):
    c = 5.0
    return ((r_cart[..., 0] - c) ** 2
            + (r_cart[..., 1] - c) ** 2
            + (r_cart[..., 2] - c) ** 2) / 2

model = dftk.Model(lattice, [], [], n_electrons=1,
                   spin_polarization="spinless",
                   term_types=[dftk.Kinetic(),
                               dftk.ExternalFromReal(pot),
                               dftk.LocalNonlinearity(lambda rho: 10.0 / 2 * rho ** 2)],
                   symmetries=False)
basis = dftk.PlaneWaveBasis(model, Ecut=30.0, kgrid=(1, 1, 1))
res = dftk.direct_minimization(basis, tol=1e-9)
print("GPE energies:", {k: round(v, 6) for k, v in res.energies.items()})
