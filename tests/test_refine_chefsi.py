"""Two-grid refinement + CheFSI eigensolver."""
import numpy as np
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk


def test_refinement_reduces_basis_error():
    from dftk_tpu.postprocess.refine import refine_scfres
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    b = dftk.PlaneWaveBasis(model, Ecut=6.0, kgrid=silicon["kgrid"])
    r = dftk.self_consistent_field(b, tol=1e-10, maxiter=50)
    ref = refine_scfres(r, Ecut_fine=12.0)
    b_f = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=silicon["kgrid"])
    r_f = dftk.self_consistent_field(b_f, tol=1e-10, maxiter=50)
    err_coarse = abs(r.total_energy - r_f.total_energy)
    err_ref = abs(ref.total_energy - r_f.total_energy)
    assert err_ref < err_coarse / 3      # substantial error reduction


def test_chefsi_matches_lobpcg():
    from dftk_tpu.ops.engine_split import self_consistent_field_split
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=6.0, kgrid=silicon["kgrid"],
                                fft_size=(16,) * 3)
    r_lob = self_consistent_field_split(basis, tol=1e-7, maxiter=40,
                                        dtype=jnp.float64, diagtol_min=1e-8)
    r_che = self_consistent_field_split(basis, tol=1e-7, maxiter=60,
                                        dtype=jnp.float64,
                                        eigensolver="chefsi",
                                        chebyshev_degree=10)
    assert r_che["converged"]
    assert abs(r_che["energies"]["total"]
               - r_lob["energies"]["total"]) < 1e-6


def test_refine_forces_reduces_force_error():
    """refine_forces (reference refine.jl:190-203): the first-order force
    correction from the refinement moves the coarse-basis forces toward the
    converged fine-basis forces (the error_estimates_forces.jl flow)."""
    from dftk_tpu.postprocess.refine import refine_scfres, refine_forces
    from testcases import make_silicon_model, silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    pos = [np.array([0.125, 0.125, 0.125]) + [0.02, 0.015, -0.01],
           np.array([-0.125, -0.125, -0.125])]
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], pos,
                           functionals=("lda_x", "lda_c_vwn"),
                           symmetries=False)
    b = dftk.PlaneWaveBasis(model, Ecut=6.0, kgrid=(2, 2, 2))
    r = dftk.self_consistent_field(b, tol=1e-10, maxiter=60)
    ref = refine_scfres(r, Ecut_fine=14.0)
    fr = refine_forces(ref)

    b_f = dftk.PlaneWaveBasis(model, Ecut=14.0, kgrid=(2, 2, 2))
    r_f = dftk.self_consistent_field(b_f, tol=1e-10, maxiter=60)
    F_exact = dftk.compute_forces(r_f)
    F_coarse = dftk.compute_forces(r)

    err_coarse = np.abs(F_coarse - F_exact).max()
    err_plain = np.abs(fr["F"] - F_exact).max()
    err_refined = np.abs(fr["F_refined"] - F_exact).max()
    # dF is a genuine correction: refined beats both the coarse-basis and
    # the transferred-but-uncorrected forces
    assert err_refined < err_plain / 2
    assert err_refined < err_coarse / 2
