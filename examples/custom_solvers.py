"""Customizing the SCF: user mixing schemes and convergence criteria
(reference examples/custom_solvers.jl).

The SCF driver is duck-typed: any object with
`mix_density(delta_F, Gsq, n_iter=...)` serves as a mixing preconditioner
(iteration-aware schedules supported, like the reference's MyMixing), and
`is_converged` accepts any callable(info_dict) -> bool.
"""
import numpy as np

import dftk_tpu as dftk


class MyMixing:
    """Simple mixing for the first `n_simple` steps, then Kerker."""

    def __init__(self, n_simple=2):
        self.n_simple = n_simple
        self.kerker = dftk.KerkerMixing()

    def mix_density(self, delta_F, Gsq, n_iter=1):
        if n_iter <= self.n_simple:
            return delta_F                 # plain fixed-point update
        return self.kerker.mix_density(delta_F, Gsq)


def my_convergence_criterion(info):
    """Converge on |E_n - E_{n-1}| < 1e-10 using closure state."""
    tol = 1e-10
    done = my_convergence_criterion.E_prev is not None and \
        abs(info["E"] - my_convergence_criterion.E_prev) < tol
    my_convergence_criterion.E_prev = info["E"]
    return done


my_convergence_criterion.E_prev = None

if __name__ == "__main__":
    a = 10.26
    lattice = a / 2 * np.array([[0, 1, 1.0], [1, 0, 1], [1, 1, 0]])
    Si = dftk.ElementPsp.from_symbol("Si")
    positions = [np.ones(3) / 8, -np.ones(3) / 8]
    model = dftk.model_DFT(lattice, [Si, Si], positions, functionals="LDA")
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=(1, 1, 1))

    res = dftk.self_consistent_field(basis, tol=1e-4, mixing=MyMixing())
    print(f"custom mixing:    E = {res.total_energy:.10f} "
          f"({len(res.history_Etot)} iterations)")

    res2 = dftk.self_consistent_field(basis, mixing=MyMixing(),
                                      is_converged=my_convergence_criterion)
    print(f"custom criterion: E = {res2.total_energy:.10f} "
          f"({len(res2.history_Etot)} iterations)")
    assert abs(res2.total_energy - res.total_energy) < 1e-5
