"""f64 energy refinement of f32 split-SCF states (VERDICT #3).

The energy functional is variational: evaluating it in f64 at the
f32-converged state leaves only an O(||delta psi||^2) error.  Measured
here: ~2e-11 Ha/atom vs the fully-f64 complex SCF on silicon -- three
orders below the BASELINE 1e-8 Ha/atom bar.
"""
import jax.numpy as jnp
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.ops.engine_split import self_consistent_field_split
from dftk_tpu.scf.energy_eval import (evaluate_total_energy,
                                      refine_split_energy,
                                      refine_split_state)


def _si_basis():
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], pos,
                           functionals=["lda_x", "lda_c_vwn"])
    return dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(2, 2, 2),
                               fft_size=(20, 20, 20))


def test_refined_f32_energy_hits_1em8_per_atom():
    basis = _si_basis()
    res64 = dftk.self_consistent_field(basis, tol=1e-12, maxiter=60)

    # standalone evaluation reproduces the SCF's own energy exactly
    E_chk = evaluate_total_energy(basis, res64.psi, res64.occupation)
    assert abs(E_chk["total"] - res64.total_energy) < 1e-12

    res32 = self_consistent_field_split(basis, tol=1e-9, maxiter=80,
                                        dtype=jnp.float32,
                                        is_converged="density")
    # raw f32 energy is ~1e-5 off; the f64 refinement closes it
    E_ref = refine_split_energy(basis, res32)
    err_per_atom = abs(E_ref["total"] - res64.total_energy) / 2
    assert err_per_atom < 1e-8, err_per_atom
    # and it genuinely improves on the raw f32 total
    raw_err = abs(res32["energies"]["total"] - res64.total_energy) / 2
    assert err_per_atom < raw_err


def test_refine_split_state_below_f32_floor():
    """VERDICT r2 item #3: polishing the chip-f32 STATE (not just the
    energy) with a few warm-started f64 iterations drives everything
    linear in the state error -- forces here -- below the f32 floor:
    <= 1e-7 vs the from-scratch f64 SCF (raw f32 state: ~1e-5.."""
    from dftk_tpu.postprocess.forces import compute_forces
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    # symmetry-broken positions => nonzero forces
    pos = [np.ones(3) / 8 + np.array([0.012, -0.007, 0.004]),
           -np.ones(3) / 8]
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], pos,
                           functionals=["lda_x", "lda_c_vwn"],
                           symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=12.0, kgrid=(2, 2, 2),
                                fft_size=(20, 20, 20))
    res64 = dftk.self_consistent_field(basis, tol=1e-12, maxiter=60)
    F64 = np.asarray(compute_forces(res64))
    assert np.abs(F64).max() > 1e-3

    res32 = self_consistent_field_split(basis, tol=1e-9, maxiter=80,
                                        dtype=jnp.float32,
                                        is_converged="density")
    refined = refine_split_state(basis, res32, tol=1e-11)
    assert refined.converged
    assert refined.n_iter <= 12, refined.n_iter     # warm start is warm
    assert abs(refined.total_energy - res64.total_energy) < 1e-10

    F_ref = np.asarray(compute_forces(refined))
    assert np.abs(F_ref - F64).max() < 1e-7, np.abs(F_ref - F64).max()
