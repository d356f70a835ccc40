"""2D Gross-Pitaevskii equation in a magnetic field (rotating condensate).

Mirrors the reference examples/gross_pitaevskii_2D.jl: a 2D harmonic
trap with a LocalNonlinearity and a uniform magnetic field B z
(symmetric-gauge vector potential via the Magnetic term); solved by
direct minimization.  The field induces a circulating probability
current in the condensate.
"""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.postprocess.current import compute_current

L = 10.0
B = 0.2
C_NL, ALPHA = 50.0, 2.0


def pot(r):
    x, y = r[..., 0] - L / 2, r[..., 1] - L / 2
    # harmonic trap + the diamagnetic |A|^2/2 of the symmetric gauge
    return (0.5 + B ** 2 / 8) * (x ** 2 + y ** 2)


def Apot(r):
    x, y = r[..., 0] - L / 2, r[..., 1] - L / 2
    return np.stack([-B / 2 * y, B / 2 * x, np.zeros_like(x)], axis=-1)


def main():
    lattice = np.diag([L, L, 0.0])            # 2D cell
    model = dftk.Model(
        lattice, [], [], n_electrons=1, spin_polarization="spinless",
        term_types=[dftk.Kinetic(), dftk.ExternalFromReal(pot),
                    dftk.LocalNonlinearity(
                        lambda rho: C_NL * rho ** ALPHA),
                    dftk.Magnetic(Apot=Apot)],
        symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=30.0, kgrid=(1, 1, 1))

    res = dftk.direct_minimization(basis, tol=1e-7)
    print("GPE-2D energies:")
    for name, val in res.energies.items():
        print(f"  {name:20s} {float(val): .8f}")

    # the field induces a circulating probability current
    j = np.asarray(compute_current(res))       # [3, n1, n2, n3]
    j_norm = float(np.abs(j[0]).max() + np.abs(j[1]).max())
    print(f"max in-plane current: {j_norm:.4f} (nonzero: rotation)")
    assert j_norm > 1e-4
    return res


if __name__ == "__main__":
    main()
