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
