"""Geometry optimization: relax a perturbed Si dimer back to symmetry."""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.postprocess.geometry import optimize_geometry

from testcases import silicon


def test_relax_si_to_symmetric():
    lattice = silicon["lattice"]
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")

    def builder(positions):
        return dftk.model_DFT(lattice, [Si, Si], positions,
                              functionals="LDA", symmetries=False)

    p0 = [np.ones(3) / 8 + np.array([0.02, -0.015, 0.01]), -np.ones(3) / 8]
    out = optimize_geometry(builder, p0, Ecut=6.0, kgrid=(1, 1, 1),
                            tol_force=1e-3, scf_kwargs=dict(tol=1e-8))
    assert out["converged"]
    assert np.abs(out["forces"]).max() < 1e-3
    d = out["positions"][0] - out["positions"][1]
    d -= np.round(d)
    np.testing.assert_allclose(np.abs(d), 0.25, atol=2e-3)
    # energy decreased along the trajectory ends
    assert out["trajectory"][-1][0] <= out["trajectory"][0][0] + 1e-10
