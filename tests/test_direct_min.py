"""Direct minimization vs SCF (the reference's scf_compare strategy)."""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.scf.direct import direct_minimization


def test_direct_minimization_matches_scf():
    from testcases import make_silicon_model
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=6.0,
                                kgrid=dftk.MonkhorstPack((2, 2, 2)),
                                fft_size=(16, 16, 16),
                                use_symmetries_for_kpoint_reduction=False)
    res_scf = dftk.self_consistent_field(basis, tol=1e-10, maxiter=50)
    res_dm = direct_minimization(basis, tol=1e-11, maxiter=500, step=0.5)
    assert res_dm.converged
    assert abs(res_dm.total_energy - res_scf.total_energy) < 1e-7
    # occupied eigenvalues agree too
    np.testing.assert_allclose(res_dm.eigenvalues[:, :4],
                               res_scf.eigenvalues[:, :4], atol=1e-5)


def test_direct_minimization_rejects_metals():
    from testcases import aluminium
    Al = dftk.ElementPsp.from_symbol("Al", psp=aluminium["psp"])
    model = dftk.model_DFT(aluminium["lattice"], [Al] * 4,
                           aluminium["positions"], functionals="LDA",
                           temperature=0.01)
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=(1, 1, 1),
                                fft_size=(24, 9, 9))
    with pytest.raises(ValueError):
        direct_minimization(basis)
