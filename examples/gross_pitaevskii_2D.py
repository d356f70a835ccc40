"""2D Gross-Pitaevskii equation with an external magnetic field.

Mirrors the reference examples/gross_pitaevskii_2D.jl (which reproduces
arXiv:1611.02045 Fig. 10): a 2D harmonic trap with a LocalNonlinearity
and the rotation term A.(-i grad) with A = omega (y, -x, 0), solved by
direct minimization.  At omega = 0.6 and eta = 500 the condensate ground
state carries quantized vortices, so the (paramagnetic) probability
current Im(psi* grad psi) is nonzero.
"""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.postprocess.current import compute_current

A_CELL = 15.0
OMEGA = 0.6
ETA, ALPHA = 500.0, 2.0
C_NL = ETA / 2


def pot(r):
    x, y = r[..., 0] - A_CELL / 2, r[..., 1] - A_CELL / 2
    return (x ** 2 + y ** 2) / 2


def Apot(r):
    x, y = r[..., 0] - A_CELL / 2, r[..., 1] - A_CELL / 2
    return OMEGA * np.stack([y, -x, np.zeros_like(x)], axis=-1)


def main():
    lattice = np.diag([A_CELL, A_CELL, 0.0])   # 2D cell
    model = dftk.Model(
        lattice, [], [], n_electrons=1, spin_polarization="spinless",
        term_types=[dftk.Kinetic(), dftk.ExternalFromReal(pot),
                    dftk.LocalNonlinearity(
                        lambda rho: C_NL * rho ** ALPHA),
                    dftk.Magnetic(Apot=Apot)],
        symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=20.0, kgrid=(1, 1, 1))

    # random start, like the reference's direct_minimization default: the
    # rotationally symmetric warm start is a SADDLE of the rotating GP
    # functional (gradient flow preserves its symmetry and never forms
    # vortices); a generic complex start breaks it and descends to the
    # vortex-carrying ground state (E = 7.60 vs 8.51 for the symmetric
    # stationary state at these parameters)
    from dftk_tpu.scf.driver import random_orbitals
    res = dftk.direct_minimization(basis, tol=1e-6, maxiter=600,
                                   psi=random_orbitals(basis, 1, seed=1))
    print(f"direct minimization: converged={res.converged} "
          f"n_iter={res.n_iter}")
    print("GPE-2D energies:")
    for name, val in res.energies.items():
        print(f"  {name:20s} {float(val): .8f}")

    # the rotation term breaks time reversal: the vortex-carrying ground
    # state has a circulating probability current
    j = np.asarray(compute_current(res))       # [3, n1, n2, n3]
    j_norm = float(np.abs(j[0]).max() + np.abs(j[1]).max())
    print(f"max in-plane current: {j_norm:.4f} (nonzero: rotation)")
    assert j_norm > 1e-4
    assert float(res.energies["Magnetic"]) < -1e-3   # rotation lowers E
    return res


if __name__ == "__main__":
    main()
