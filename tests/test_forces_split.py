"""Split-engine (chip-path) forces vs the complex-f64 reference.

VERDICT round-1 item #4: the split engine must produce forces without
complex dtypes or x64.  Validated here on CPU by evaluating both force
paths on the IDENTICAL converged state: f64 split must agree to machine
precision, f32 split to ~1e-6 (the f32 representation of psi/rho bounds
it); measured on the real TPU chip: 1.3e-6 vs CPU f64.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.engine_split import prepare_split_data, realify_orbitals
from dftk_tpu.ops.forces_split import compute_forces_split
from dftk_tpu.postprocess.forces import compute_forces


@pytest.fixture(scope="module")
def si_state():
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    pos = [np.array([0.127, 0.125, 0.123]), -np.ones(3) / 8]
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], pos,
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=8.0, kgrid=(2, 2, 2),
                                fft_size=(18, 18, 18))
    res = dftk.self_consistent_field(basis, tol=1e-10, maxiter=50)
    return basis, res, compute_forces(res)


def _split_inputs(res, dtype):
    U = realify_orbitals(jnp.asarray(res.psi)).astype(dtype)
    occ_r = jnp.concatenate([jnp.asarray(res.occupation)] * 2,
                            axis=1).astype(dtype) / 2
    rho = jnp.asarray(res.rho, dtype=dtype)
    return U, occ_r, rho


def test_split_forces_f64_machine_precision(si_state):
    basis, res, F_ref = si_state
    sd = prepare_split_data(basis, dtype=jnp.float64)
    U, occ_r, rho = _split_inputs(res, jnp.float64)
    F = compute_forces_split(basis, sd, U, occ_r, rho)
    assert np.abs(F - F_ref).max() < 1e-12


def test_split_forces_f32_chip_accuracy(si_state):
    basis, res, F_ref = si_state
    sd = prepare_split_data(basis, dtype=jnp.float32)
    U, occ_r, rho = _split_inputs(res, jnp.float32)
    F = compute_forces_split(basis, sd, U, occ_r, rho)
    assert np.abs(F - F_ref).max() < 3e-6


def test_ewald_numpy_gradient_matches_jax():
    from dftk_tpu.ops.ewald import energy_ewald, ewald_position_gradient_np
    a = 5.13
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0]])
    pos = np.array([[0.13, 0.12, 0.12], [-0.125, -0.125, -0.121]])
    q = np.array([4.0, 4.0])
    gnp = ewald_position_gradient_np(lattice, q, pos)
    gjx = jax.grad(lambda p: energy_ewald(lattice, q, p))(jnp.asarray(pos))
    assert np.abs(gnp - np.asarray(gjx)).max() < 1e-12


_C_UPF = str(__import__("pathlib").Path(__file__).parent / "data/pseudos/C_m.upf")


@pytest.mark.skipif(not __import__("os").path.exists(_C_UPF),
                    reason="NLCC UPF test file not available")
def test_split_forces_nlcc_f64(si_state):
    """NLCC core-XC force term in the split path (carbon UPF)."""
    C = dftk.ElementPsp.from_symbol("C", psp=_C_UPF)
    a = 6.74
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    pos = [np.array([0.128, 0.124, 0.122]), -np.ones(3) / 8]
    model = dftk.model_DFT(lattice, [C, C], pos, functionals="PBE")
    basis = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(2, 2, 2),
                                fft_size=(20, 20, 20))
    res = dftk.self_consistent_field(basis, tol=1e-10, maxiter=60)
    F_ref = compute_forces(res)
    sd = prepare_split_data(basis, dtype=jnp.float64)
    assert sd.rho_core is not None    # split SCF sees the core density too
    U, occ_r, rho = _split_inputs(res, jnp.float64)
    F = compute_forces_split(basis, sd, U, occ_r, rho)
    assert np.abs(F - F_ref).max() < 1e-12
