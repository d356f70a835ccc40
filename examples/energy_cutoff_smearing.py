"""Energy cutoff smearing (reference examples/energy_cutoff_smearing.jl).

At low Ecut the ground-state energy E(a) vs lattice constant is jagged
because the basis-set size jumps discretely with a.  A modified kinetic
term ("blow-up function", BlowupCHV of Cances-Hassan-Vidal 2024) restores
C^2 smoothness, making E(a) minimizable even at Ecut=5.
"""
import numpy as np

import dftk_tpu as dftk

a0 = 10.26  # experimental Si lattice constant (bohr)
a_list = a0 * np.linspace(0.98, 1.02, 8)


def ground_state_energy(a, blowup, Ecut=5.0, kgrid=(2, 2, 2)):
    lattice = a / 2 * np.array([[0, 1, 1.0], [1, 0, 1], [1, 1, 0]])
    Si = dftk.ElementPsp.from_symbol("Si", family="pbe")
    positions = [np.ones(3) / 8, -np.ones(3) / 8]
    model = dftk.model_DFT(lattice, [Si, Si], positions, functionals="PBE",
                           kinetic_blowup=blowup)
    basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=kgrid)
    return dftk.self_consistent_field(basis, tol=1e-6).total_energy


def second_differences(E):
    return np.diff(E, 2)


if __name__ == "__main__":
    E_naive = np.array([ground_state_energy(a, None) for a in a_list])
    E_chv = np.array([ground_state_energy(a, dftk.BlowupCHV())
                      for a in a_list])
    print("a/a0      E(Identity)       E(BlowupCHV)")
    for a, en, ec in zip(a_list, E_naive, E_chv):
        print(f"{a/a0:.3f}  {en: .10f}  {ec: .10f}")
    # smoothness proxy: the CHV curve's second differences fluctuate less
    rough_naive = float(np.std(second_differences(E_naive)))
    rough_chv = float(np.std(second_differences(E_chv)))
    print(f"roughness (std of 2nd differences): naive={rough_naive:.2e} "
          f"CHV={rough_chv:.2e}")
    a_min = a_list[int(np.argmin(E_chv))]
    print(f"estimated a0 from CHV curve: {a_min:.3f} (exp {a0})")
    assert rough_chv < rough_naive
