"""Cohen-Bergstresser empirical pseudopotential band structure of silicon.

Mirrors the reference examples/cohen_bergstresser.jl: the CB potential
(PRB 141, 789 (1966)) has form factors only at the |G|^2 = 3, 8, 11 shells,
no SCF is needed (term_types = Kinetic + AtomicLocal only), and the Si
direct gap at Gamma comes out near the empirical ~2.5 eV the fit targets.
"""
import numpy as np

import dftk_tpu as dftk


def main():
    Si = dftk.ElementCohenBergstresser(symbol="Si")
    a = Si.lattice_constant
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0.0]])
    model = dftk.Model(lattice, [Si, Si],
                       [np.ones(3) / 8, -np.ones(3) / 8],
                       term_types=[dftk.Kinetic(), dftk.AtomicLocal()])
    basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(2, 2, 2))

    # non-self-consistent: diagonalize H once along a k-path
    scfres = dftk.self_consistent_field(basis, tol=1e-6, maxiter=1,
                                        n_bands=8)
    bands = dftk.compute_bands(scfres, kline_density=8, n_bands=6)
    eps = np.asarray(bands["eigenvalues"])          # [nk, nb]
    # 4 filled bands (8 valence electrons): direct gap at Gamma
    kpath = np.asarray(bands["kcoords"])
    i_gamma = int(np.argmin(np.linalg.norm(kpath, axis=1)))
    gap = (eps[i_gamma, 4] - eps[i_gamma, 3]) * 27.2114
    print(f"CB silicon direct gap at Gamma: {gap:.2f} eV (empirical ~2.5)")
    assert 1.5 < gap < 4.0
    return bands


if __name__ == "__main__":
    main()
