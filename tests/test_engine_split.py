"""Split-real engine (complex-free device code) vs the complex engine.

The axon TPU backend supports no complex GEMMs/FFT/linalg; the split engine
(ops/engine_split.py) realifies everything.  These tests pin its exactness
against the complex engine in f64 and its f32 accuracy envelope.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk
from dftk_tpu.kernels.dft_matmul import dft3, from_split, to_split
from dftk_tpu.ops import hamiltonian as hamops
from dftk_tpu.ops.density import guess_density
from dftk_tpu.ops.engine_split import (apply_H_split, make_split_ham,
                                       prepare_split_data, realify_orbitals,
                                       self_consistent_field_split)
from dftk_tpu.scf.driver import random_orbitals


def test_dft_matmul_matches_fft():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 7, 8)) + 1j * rng.normal(size=(2, 6, 7, 8))
    y = from_split(np.asarray(dft3(jnp.asarray(to_split(x)), sign=-1)))
    np.testing.assert_allclose(y, np.fft.fftn(x, axes=(-3, -2, -1)),
                               atol=1e-11)
    yb = from_split(np.asarray(dft3(jnp.asarray(to_split(x)), sign=+1))) / 336
    np.testing.assert_allclose(yb, np.fft.ifftn(x, axes=(-3, -2, -1)),
                               atol=1e-12)


@pytest.fixture(scope="module")
def si_setup():
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                                fft_size=(18, 18, 18))
    return basis


def test_apply_H_split_matches_complex(si_setup):
    basis = si_setup
    model = basis.model
    rho = guess_density(basis)
    V, _ = hamops.total_potential(basis.terms, rho,
                                  jnp.asarray(basis.G_cube_cart),
                                  model.unit_cell_volume)
    ham = hamops.build_ham(basis.data, basis.terms.data, V)
    psi = random_orbitals(basis, 4)
    H_c = hamops.apply_H(ham, psi, basis.fft_size, model.unit_cell_volume)

    sd = prepare_split_data(basis, dtype=jnp.float64)
    H_s = apply_H_split(make_split_ham(sd, V), realify_orbitals(psi),
                        basis.fft_size, model.unit_cell_volume)
    nG = basis.nG_max
    H_s_c = H_s[:, :4, :nG] + 1j * H_s[:, :4, nG:]
    assert float(jnp.max(jnp.abs(H_s_c - H_c))) < 1e-12


def test_split_scf_matches_complex_f64(si_setup):
    basis = si_setup
    res_c = dftk.self_consistent_field(basis, tol=1e-8, is_converged="energy",
                                       n_bands=8)
    res_s = self_consistent_field_split(basis, tol=1e-8, maxiter=40,
                                        n_bands=8, dtype=jnp.float64,
                                        diagtol_min=1e-7)
    assert res_s["converged"]
    assert abs(res_s["energies"]["total"] - res_c.total_energy) < 1e-9
    assert np.max(np.abs(res_s["eigenvalues"][:, :8]
                         - res_c.eigenvalues[:, :8])) < 1e-6


def test_split_scf_f32_accuracy(si_setup):
    """f32 split SCF within the reference's Float32 test envelope (1e-4)."""
    basis = si_setup
    res = self_consistent_field_split(basis, tol=2e-5, maxiter=30,
                                      dtype=jnp.float32)
    assert res["converged"]
    assert abs(res["energies"]["total"] - (-7.8890399)) < 2e-3


def test_chefsi_filter_precision_path():
    """filter_precision plumbs a second apply into CheFSI (same physics)."""
    import jax.numpy as jnp
    from testcases import make_silicon_model
    import dftk_tpu as dftk
    from dftk_tpu.ops.engine_split import self_consistent_field_split
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=(1, 1, 1))
    r1 = self_consistent_field_split(b, tol=1e-8, maxiter=40,
                                     eigensolver="chefsi",
                                     chebyshev_degree=8, chefsi_cycles=2,
                                     dtype=jnp.float64)
    r2 = self_consistent_field_split(b, tol=1e-8, maxiter=40,
                                     eigensolver="chefsi",
                                     chebyshev_degree=8, chefsi_cycles=2,
                                     dtype=jnp.float64,
                                     filter_precision="highest")
    assert r1["converged"] and r2["converged"]
    assert abs(r1["energies"]["total"] - r2["energies"]["total"]) < 1e-7


def test_chefsi_mixed_filter_default_ab():
    """A/B pin of the production default: filter_precision defaults to
    "mixed" (1-pass bf16 filter cycles + exact finish) and converges to the
    SAME energy as the all-exact "highest" filter.

    On a CPU backend the bf16/f32 matmul settings are numerically identical,
    so this pins the mixed SCHEDULE (traced per-iteration bf16/exact cycle
    split, lax.cond filter selection); the bf16 NUMERICS A/B runs on the
    real chip and is recorded as a driver artifact (AB_FILTER_r05.json,
    tools/run_ab_filter.py - Si64: identical refined energies)."""
    import inspect
    from testcases import make_silicon_model
    sig = inspect.signature(self_consistent_field_split)
    assert sig.parameters["filter_precision"].default == "mixed"
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=(1, 1, 1))
    kw = dict(tol=1e-8, maxiter=40, eigensolver="chefsi",
              chebyshev_degree=8, chefsi_cycles=2, dtype=jnp.float32)
    r_mixed = self_consistent_field_split(b, **kw)      # default: "mixed"
    r_exact = self_consistent_field_split(b, filter_precision="highest",
                                          **kw)
    assert r_mixed["converged"] and r_exact["converged"]
    assert abs(r_mixed["energies"]["total"]
               - r_exact["energies"]["total"]) < 1e-6


def test_split_scf_stall_exit_returns_best_iterate():
    """Noise-floor stall exit: an unreachable density tolerance (1e-12 in
    f32) must NOT burn maxiter iterations re-sampling the floor.  The run
    exits once the best residual stops improving for `stall_patience`
    iterations, flags stalled=True, and returns the best iterate - whose
    energy matches the normally-converged run (this is the Si256
    north-star behavior, SI256_r05.json, at test scale)."""
    from testcases import make_silicon_model
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=(1, 1, 1))
    kw = dict(maxiter=80, eigensolver="chefsi", chebyshev_degree=8,
              chefsi_cycles=2, dtype=jnp.float32, is_converged="density")
    r_ref = self_consistent_field_split(b, tol=1e-6, **kw)
    assert r_ref["converged"] and not r_ref["stalled"]
    r = self_consistent_field_split(b, tol=1e-12, stall_patience=4, **kw)
    assert r["stalled"] and not r["converged"]
    assert r["n_iter"] < kw["maxiter"]
    assert abs(r["energies"]["total"] - r_ref["energies"]["total"]) < 1e-5


def test_pallas_fused_local_matches_xla(si_setup):
    """The fused Pallas local-apply kernel (interpret mode on CPU) equals
    the XLA dot_general chain bit-for-bit at f64."""
    basis = si_setup
    model = basis.model
    rho = guess_density(basis)
    V, _ = hamops.total_potential(basis.terms, rho,
                                  jnp.asarray(basis.G_cube_cart),
                                  model.unit_cell_volume)
    sd = prepare_split_data(basis, dtype=jnp.float64)
    psi = random_orbitals(basis, 3)
    U = realify_orbitals(psi)
    ham = make_split_ham(sd, V)
    H_x = apply_H_split(ham, U, basis.fft_size, model.unit_cell_volume,
                        pallas=False)

    import dftk_tpu.kernels.fused_local as fl
    orig = fl.fused_local_apply
    fl.fused_local_apply = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        H_p = apply_H_split(ham, U, basis.fft_size, model.unit_cell_volume,
                            pallas=True)
    finally:
        fl.fused_local_apply = orig
    assert float(jnp.max(jnp.abs(H_p - H_x))) < 1e-12


def test_paired_band_repr_matches_csplit(si_setup):
    """The round-1 doubled-real representation stays available and agrees
    with the default csplit (J-adapted complex band) representation."""
    basis = si_setup
    res_c = self_consistent_field_split(basis, tol=1e-9, maxiter=40,
                                        n_bands=8, dtype=jnp.float64,
                                        diagtol_min=1e-7)
    res_p = self_consistent_field_split(basis, tol=1e-9, maxiter=40,
                                        n_bands=8, dtype=jnp.float64,
                                        diagtol_min=1e-7, band_repr="paired")
    assert res_c["converged"] and res_p["converged"]
    assert abs(res_c["energies"]["total"] - res_p["energies"]["total"]) < 1e-8
    assert np.max(np.abs(res_c["eigenvalues"][:, :8]
                         - res_p["eigenvalues"][:, :8])) < 1e-5


def test_split_scf_warm_restart():
    """rho0/U0 warm start: restarting from a converged state converges in
    very few iterations to the same energy (chip checkpoint/resume)."""
    import jax.numpy as jnp
    from dftk_tpu.ops.engine_split import self_consistent_field_split
    from testcases import make_silicon_model
    import dftk_tpu as dftk
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=(1, 1, 1))
    r1 = self_consistent_field_split(b, tol=1e-9, maxiter=50,
                                     dtype=jnp.float64)
    assert r1["converged"]
    r2 = self_consistent_field_split(b, tol=1e-9, maxiter=8,
                                     dtype=jnp.float64,
                                     rho0=r1["rho"], U0=r1["U"])
    assert r2["converged"]
    assert r2["n_iter"] <= 4
    assert abs(r2["energies"]["total"] - r1["energies"]["total"]) < 1e-8


def test_split_adaptive_bands_metal():
    """AdaptiveBands on the split engine (reference
    src/scf/nbands_algorithm.jl:20-90): an Al SCF started with a band
    window so small that the TOP band is partially occupied must grow its
    band count instead of silently misconverging the occupations."""
    a = 7.65339
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    Al = dftk.ElementPsp.from_symbol("Al", psp="lda/al-q3")
    model = dftk.model_DFT(lattice, [Al], [np.zeros(3)],
                           functionals=["lda_x", "lda_c_vwn"],
                           temperature=1e-2, symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=6.0, kgrid=(2, 2, 2),
                                fft_size=(15, 15, 15))
    res_c = dftk.self_consistent_field(basis, tol=1e-10, maxiter=60,
                                       n_bands=6, n_extra_bands=4)

    grew = []
    res_s = self_consistent_field_split(
        basis, tol=1e-9, maxiter=50, dtype=jnp.float64, diagtol_min=1e-8,
        n_bands=2, n_extra_bands=0,   # too small: band 2 holds ~0.5 e-/spin
        callback=lambda i: grew.append(i.get("adaptive_bands"))
        if isinstance(i, dict) and i.get("adaptive_bands") else None)
    assert res_s["converged"]
    assert grew, "adaptive bands never triggered"
    occ = np.asarray(res_s["occupation"])
    assert occ.shape[1] > 2                      # window actually grew
    assert occ[:, -1].max() < 1e-6               # top band now unoccupied
    assert abs(res_s["energies"]["total"] - res_c.total_energy) < 1e-7

    # without the safety net the same window misconverges the occupations
    res_bad = self_consistent_field_split(
        basis, tol=1e-9, maxiter=50, dtype=jnp.float64, diagtol_min=1e-8,
        n_bands=2, n_extra_bands=0, adaptive_bands=False)
    occ_bad = np.asarray(res_bad["occupation"])
    assert occ_bad[:, -1].max() > 1e-6
