"""Initial guess densities: atomic superposition, random, spin-polarised.

Mirrors the reference examples/density_methods.jl: compare SCF behaviour
from (a) the Gaussian atomic-superposition guess (default), (b) a random
density, and (c) a spin-polarised guess built from per-atom magnetic
moments — all normalised to the electron count.
"""
import numpy as np

import dftk_tpu as dftk


def main():
    a = 7.65339
    lattice = a * np.eye(3)
    Al = dftk.ElementPsp.from_symbol("Al", psp="lda/al-q3")
    positions = [np.zeros(3), np.array([0.5, 0.5, 0]),
                 np.array([0.5, 0, 0.5]), np.array([0, 0.5, 0.5])]

    model = dftk.model_DFT(lattice, [Al] * 4, positions,
                           functionals=["lda_x", "lda_c_vwn"],
                           temperature=1e-3)
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(2, 2, 2))

    rho_atomic = np.asarray(dftk.guess_density(basis))
    rho_random = np.asarray(dftk.random_density(basis))
    dvol = basis.dvol
    for name, rho in (("atomic", rho_atomic), ("random", rho_random)):
        n_el = float(rho.sum() * dvol)
        print(f"{name:7s} guess: integral(rho) = {n_el:.6f} "
              f"(n_electrons = {model.n_electrons})")
        assert abs(n_el - model.n_electrons) < 1e-8

    res_a = dftk.self_consistent_field(basis, tol=1e-6, rho=rho_atomic)
    res_r = dftk.self_consistent_field(basis, tol=1e-6, rho=rho_random,
                                       maxiter=60)
    print(f"atomic guess: {res_a.n_iter} iterations, random: "
          f"{res_r.n_iter}; same E to "
          f"{abs(res_a.total_energy - res_r.total_energy):.1e}")
    assert abs(res_a.total_energy - res_r.total_energy) < 1e-5

    # spin-polarised guess from magnetic moments (collinear iron-style)
    model_s = dftk.model_DFT(lattice, [Al] * 4, positions,
                             functionals=["lda_x", "lda_c_vwn"],
                             spin_polarization="collinear",
                             temperature=1e-3)
    basis_s = dftk.PlaneWaveBasis(model_s, Ecut=7.0, kgrid=(2, 2, 2))
    rho_s = np.asarray(dftk.guess_density(basis_s,
                                          magnetic_moments=[1.0] * 4))
    mag = float((rho_s[0] - rho_s[1]).sum() * basis_s.dvol)
    print(f"spin guess: total magnetization = {mag:.4f} mu_B")
    assert 3.0 < mag < 5.0
    return res_a


if __name__ == "__main__":
    main()
