"""Split-engine (chip-path) stresses vs the complex-f64 lattice-AD path.

VERDICT round-1 item #4 (stress half): the split engine evaluates
sigma = (1/vol) dE/d(strain) without complex dtypes / x64.  Same-state
comparison: f64 split agrees with the complex path to ~1e-13 (host-FD
Ewald bound), f32 to ~4e-8 on this silicon setup.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.engine_split import prepare_split_data, realify_orbitals
from dftk_tpu.ops.stresses_split import compute_stresses_split
from dftk_tpu.postprocess.stresses import compute_stresses_cart


@pytest.fixture(scope="module")
def si_strained():
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    model = dftk.model_DFT(1.02 * silicon["lattice"], [Si, Si], pos,
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=8.0, kgrid=(2, 2, 2),
                                fft_size=(18, 18, 18))
    res = dftk.self_consistent_field(basis, tol=1e-11, maxiter=50)
    return basis, res, compute_stresses_cart(res)


def _split_inputs(res, dtype):
    U = realify_orbitals(jnp.asarray(res.psi)).astype(dtype)
    occ_r = jnp.concatenate([jnp.asarray(res.occupation)] * 2,
                            axis=1).astype(dtype) / 2
    return U, occ_r


def test_split_stress_f64(si_strained):
    basis, res, S_ref = si_strained
    sd = prepare_split_data(basis, dtype=jnp.float64)
    U, occ_r = _split_inputs(res, jnp.float64)
    S = compute_stresses_split(basis, sd, U, occ_r)
    assert np.abs(S - S_ref).max() < 1e-11


def test_split_stress_f32(si_strained):
    basis, res, S_ref = si_strained
    sd = prepare_split_data(basis, dtype=jnp.float32)
    U, occ_r = _split_inputs(res, jnp.float32)
    S = compute_stresses_split(basis, sd, U, occ_r)
    assert np.abs(S - S_ref).max() < 5e-7


def test_ewald_energy_numpy_matches_jax():
    from dftk_tpu.ops.ewald import energy_ewald, energy_ewald_np
    a = 5.13
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0]])
    pos = np.array([[0.13, 0.12, 0.12], [-0.125, -0.125, -0.121]])
    q = np.array([4.0, 4.0])
    assert abs(float(energy_ewald(lattice, q, pos))
               - energy_ewald_np(lattice, q, pos)) < 1e-12
