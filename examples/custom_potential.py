"""Custom potential: 1D Gross-Pitaevskii with user-defined Gaussian nuclei.

Mirrors the reference examples/custom_potential.jl: define a custom Element
whose local potential is attached to atoms, solve the nonlinear problem and
compute forces on the "nuclei".  (dftk_tpu ships the same physics as
ElementGaussian; the explicit class here demonstrates the protocol: any
object with `local_potential_fourier(p)` and the charge accessors works.)
"""
import math

import numpy as np

import dftk_tpu as dftk


class CustomPotential:
    """V(r) = -alpha/(sqrt(2 pi) L) exp(-(r/L)^2/2) -- a Gaussian 'nucleus'.

    The Element protocol (models/elements.py): `local_potential_fourier(p)`
    evaluated at Cartesian |p| (the analytic transform of V), plus zero
    ionic/valence charges so no Ewald/psp-correction terms appear.
    """

    def __init__(self, alpha=1.0, L=0.5):
        self.alpha, self.L = alpha, L
        self.symbol = "X"

    def local_potential_fourier(self, p):
        return -self.alpha * np.exp(-(p * self.L) ** 2 / 2)

    def charge_ionic(self):
        return 0

    def charge_nuclear(self):
        return 0


def main():
    a = 10.0
    lattice = np.diag([a, 0.0, 0.0])           # 1D cell (two zero vectors)
    # two nuclei, |x1-x2| != 0.5 to break symmetry -> nonzero forces
    x1, x2 = 0.2, 0.8
    gauss = CustomPotential()
    C, alpha = 1.0, 2.0
    model = dftk.Model(lattice, [gauss, gauss],
                       [np.array([x1, 0, 0]), np.array([x2, 0, 0])],
                       n_electrons=1, spin_polarization="spinless",
                       term_types=[dftk.Kinetic(), dftk.AtomicLocal(),
                                   dftk.LocalNonlinearity(
                                       lambda rho: C * rho ** alpha)],
                       symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=500, kgrid=(1, 1, 1))

    rho0 = np.zeros((1,) + basis.fft_size)      # start from zero density
    res = dftk.self_consistent_field(basis, tol=1e-5, rho=rho0)
    print("GPE energies:")
    for name, val in res.energies.items():
        print(f"  {name:18s} {val: .10f}")

    forces = dftk.compute_forces(res)
    print("forces (reduced):", np.asarray(forces)[:, 0])
    # opposite forces pulling the two nuclei together along x
    assert abs(forces[0][0] + forces[1][0]) < 1e-5
    return res, forces


if __name__ == "__main__":
    main()
