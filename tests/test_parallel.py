"""Multi-device k-point sharding: equality with single-device execution.

The analogue of the reference's mpiexec re-run strategy (SURVEY.md section 4):
the same SCF, once on one device and once k-sharded over the 8 virtual CPU
devices, must agree to near machine precision.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk
from dftk_tpu.parallel.mesh import distribute, kpoint_mesh


def _make_basis():
    from testcases import make_silicon_model
    model = make_silicon_model()
    # full reducible 2x2x2 grid -> 8 k-points, one per device
    return dftk.PlaneWaveBasis(model, Ecut=5.0,
                               kgrid=dftk.MonkhorstPack((2, 2, 2)),
                               fft_size=(16, 16, 16),
                               use_symmetries_for_kpoint_reduction=False)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_scf_matches_single_device():
    basis1 = _make_basis()
    res1 = dftk.self_consistent_field(basis1, tol=1e-10, maxiter=30, seed=7)

    basis8 = _make_basis()
    mesh = kpoint_mesh(8)
    distribute(basis8, mesh)
    res8 = dftk.self_consistent_field(basis8, tol=1e-10, maxiter=30, seed=7)

    assert abs(res1.total_energy - res8.total_energy) < 1e-9
    np.testing.assert_allclose(np.sort(res1.eigenvalues, axis=None),
                               np.sort(res8.eigenvalues, axis=None), atol=1e-8)
    np.testing.assert_allclose(np.asarray(res8.rho), np.asarray(res1.rho),
                               atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_split_scf_matches_single_device():
    """The PRODUCTION multi-chip path: split-real engine SCF sharded over a
    2D kpts x bands mesh equals the unsharded split run (f64 here)."""
    from jax.sharding import Mesh
    from dftk_tpu.ops.engine_split import self_consistent_field_split

    basis1 = _make_basis()
    res1 = self_consistent_field_split(basis1, tol=1e-10, maxiter=25,
                                       n_bands=6, dtype=jnp.float64, seed=5)

    basis8 = _make_basis()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                axis_names=("kpts", "bands"))
    with mesh:
        res8 = self_consistent_field_split(basis8, tol=1e-10, maxiter=25,
                                           n_bands=6, dtype=jnp.float64,
                                           seed=5, mesh=mesh)

    assert res1["converged"] and res8["converged"]
    assert abs(res1["energies"]["total"] - res8["energies"]["total"]) < 1e-6
    np.testing.assert_allclose(np.asarray(res8["rho"]),
                               np.asarray(res1["rho"]), atol=1e-6)
    # the bands-sharded run may carry extra padding bands; compare the
    # physically requested ones
    np.testing.assert_allclose(np.sort(res8["eigenvalues"][:, :6], axis=None),
                               np.sort(res1["eigenvalues"][:, :6], axis=None),
                               atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_padding_with_phantom_kpoints():
    """nk not divisible by mesh size: phantom zero-weight k-points pad it."""
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=silicon["kgrid"],
                                fft_size=(16, 16, 16))   # 4 k-points
    basis_ref = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=silicon["kgrid"],
                                    fft_size=(16, 16, 16))
    res_ref = dftk.self_consistent_field(basis_ref, tol=1e-10, maxiter=30, seed=3)

    mesh = kpoint_mesh(8)
    distribute(basis, mesh)          # pads 4 -> 8
    assert basis.n_kpoints == 8
    assert abs(float(jnp.sum(basis.data.kweights)) - 1.0) < 1e-12
    res = dftk.self_consistent_field(basis, tol=1e-10, maxiter=30, seed=3)
    assert abs(res.total_energy - res_ref.total_energy) < 1e-9
