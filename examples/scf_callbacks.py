"""SCF callbacks: live convergence monitoring + checkpoint/restart.

Mirrors the reference examples/scf_callbacks.jl: a user callback collects
the density-residual history during the run (composable with any other
callback), and save_scfres / load_scfres give checkpointing — restarting
from the saved state converges immediately.
"""
import os
import tempfile

import numpy as np

import dftk_tpu as dftk
from dftk_tpu.io.scfres import load_scfres, save_scfres


def main():
    a = 5.131570667152971
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0.0]])
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    model = dftk.model_DFT(lattice, [Si, Si],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(2, 2, 2))

    drho_history = []

    def my_callback(info):
        drho_history.append(float(info["drho"]))
        print(f"  iter {info['n_iter']:2d}  E = {info['E']:+.10f}  "
              f"drho = {info['drho']:.2e}")

    scfres = dftk.self_consistent_field(basis, tol=1e-8,
                                        callback=my_callback)

    # checkpoint + restart: resuming from the saved state is a no-op SCF
    ckpt = os.path.join(tempfile.gettempdir(), "scf_checkpoint.npz")
    save_scfres(ckpt, scfres)
    loaded = load_scfres(ckpt)
    res2 = dftk.self_consistent_field(
        loaded["basis"], tol=1e-8,
        rho=dftk.guess_density(loaded["basis"]) * 0 + loaded["rho"],
        psi=loaded["psi"])
    assert res2.n_iter <= 2
    assert abs(res2.total_energy - scfres.total_energy) < 1e-8
    # residual history: converged by > 4 orders of magnitude
    assert drho_history[-1] < 1e-4 * max(drho_history)
    print(f"checkpoint restart: E = {res2.total_energy:.10f} in "
          f"{res2.n_iter} iteration(s); history of {len(drho_history)} "
          f"residuals recorded")
    os.unlink(ckpt)
    return scfres


if __name__ == "__main__":
    main()
