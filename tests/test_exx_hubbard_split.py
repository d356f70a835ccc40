"""Split-engine (chip) exact exchange and DFT+U vs the complex engine.

Closes the last chip-feature-matrix gap (VERDICT r2 missing #1): hybrids
and Hubbard now run on the realified split engine.  f64 parity against the
complex driver validates the algebra; the f32 default is what the chip
runs.  Reference physics: src/terms/exact_exchange.jl, src/terms/hubbard.jl.
"""
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.models.standard import PBE0, model_HF
from dftk_tpu.ops.engine_split import self_consistent_field_split

UPF = str(pathlib.Path(__file__).parent / "data/pseudos/gth/Si.pbe-hgh.upf")


def _he_box(model_fn, Ecut=8.0, a=8.0):
    lattice = np.eye(3) * a
    He = dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")
    m = model_fn(lattice, [He], [np.array([.5, .5, .5])], symmetries=False)
    return dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=(1, 1, 1))


def test_split_hf_matches_complex_f64():
    b = _he_box(model_HF)
    r_c = dftk.self_consistent_field(b, tol=1e-10, maxiter=60,
                                     is_converged="energy")
    r_s = self_consistent_field_split(b, tol=1e-10, maxiter=60,
                                      dtype=jnp.float64,
                                      eigensolver="lobpcg",
                                      is_converged="energy")
    assert r_s["converged"]
    # the total is variational (2nd order in the residual state error);
    # individual components are 1st order, so only the total carries the
    # tight cross-engine bar. The component FORMULA is checked at the
    # same state below (test_split_exchange_energy_same_state).
    assert abs(r_s["energies"]["total"] - r_c.total_energy) < 1e-7
    assert abs(r_s["energies"]["ExactExchange"]
               - r_c.energies["ExactExchange"]) < 5e-5


def test_split_exchange_energy_same_state():
    """Split-vs-complex exchange energy on the SAME state: pure algebra."""
    from dftk_tpu.ops.exx_split import exchange_energy_split
    b = _he_box(model_HF)
    r_c = dftk.self_consistent_field(b, tol=1e-10, maxiter=60,
                                     is_converged="energy")
    psi = r_c.psi
    U = jnp.concatenate([psi.real, psi.imag], axis=-1)
    occ = r_c.occupation
    E_s = exchange_energy_split(
        jnp.asarray(b.terms.exx_kernel_np[0]), U,
        occ / b.model.filled_occupation, occ, jnp.asarray(b.kweights),
        jnp.asarray(b.Gidx_np), jnp.asarray(b.mask_np, dtype=U.dtype),
        b.fft_size, b.model.unit_cell_volume)
    assert abs(float(E_s) - float(r_c.energies["ExactExchange"])) < 1e-10


def test_split_pbe0_matches_complex_f64():
    b = _he_box(PBE0)
    r_c = dftk.self_consistent_field(b, tol=1e-10, maxiter=60,
                                     is_converged="energy")
    r_s = self_consistent_field_split(b, tol=1e-10, maxiter=60,
                                      dtype=jnp.float64,
                                      eigensolver="lobpcg",
                                      is_converged="energy")
    assert r_s["converged"]
    assert abs(r_s["energies"]["total"] - r_c.total_energy) < 1e-7


def test_split_ace_exact_on_span_and_bare_parity():
    """V_ACE psi == Vx psi on the generating span; ACE and bare SCFs agree."""
    from dftk_tpu.ops.exx_split import (apply_ace_split,
                                        apply_exchange_split,
                                        build_ace_split)
    b = _he_box(model_HF)
    r = self_consistent_field_split(b, tol=1e-10, maxiter=60,
                                    dtype=jnp.float64,
                                    eigensolver="lobpcg",
                                    is_converged="energy")
    U = r["U"]
    occ = r["occupation"]
    f_norm = occ / b.model.filled_occupation
    kern = jnp.asarray(b.terms.exx_kernel_np[0])
    Gidx = jnp.asarray(b.Gidx_np)
    mask = jnp.asarray(b.mask_np, dtype=U.dtype)
    xi = build_ace_split(kern, U, f_norm, Gidx, mask, b.fft_size,
                         b.model.unit_cell_volume)
    d = jnp.abs(apply_ace_split(xi, U)
                - apply_exchange_split(kern, U, f_norm, U, Gidx, mask,
                                       b.fft_size,
                                       b.model.unit_cell_volume)).max()
    assert float(d) < 1e-9

    r_raw = self_consistent_field_split(b, tol=1e-10, maxiter=60,
                                        dtype=jnp.float64,
                                        eigensolver="lobpcg",
                                        is_converged="energy", use_ace=False)
    assert abs(r_raw["energies"]["total"] - r["energies"]["total"]) < 5e-8


def test_split_exx_f32_envelope():
    """The chip-default f32 hybrid SCF stays within the f32 envelope."""
    b = _he_box(PBE0)
    r_c = dftk.self_consistent_field(b, tol=1e-10, maxiter=60,
                                     is_converged="energy")
    r_s = self_consistent_field_split(b, tol=1e-7, maxiter=60,
                                      dtype=jnp.float32,
                                      eigensolver="lobpcg",
                                      is_converged="energy")
    # measured 6.4e-5 on CPU-emulated f32 (E_tot ~ 2.5 Ha, ~25 f32 SCF
    # iterations); the pure-DFT f32 envelope test uses 2e-3 (test_engine_split)
    assert abs(r_s["energies"]["total"] - r_c.total_energy) < 2e-4


@pytest.mark.skipif(not pathlib.Path(UPF).exists(),
                    reason="vendored UPF not available")
def test_split_hubbard_matches_complex_f64():
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=UPF)
    mfs = (dftk.HubbardManifold(atom_index=0, l=1, U=0.1),
           dftk.HubbardManifold(atom_index=1, l=1, U=0.1))
    m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                       functionals="PBE",
                       extra_terms=[dftk.Hubbard(manifolds=mfs)])
    b = dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=silicon["kgrid"],
                            fft_size=(16,) * 3)
    r_c = dftk.self_consistent_field(b, tol=1e-9, maxiter=40,
                                     is_converged="energy")
    r_s = self_consistent_field_split(b, tol=1e-9, maxiter=40,
                                      dtype=jnp.float64,
                                      eigensolver="lobpcg",
                                      is_converged="energy")
    assert r_s["converged"]
    assert abs(r_s["energies"]["total"] - r_c.total_energy) < 1e-6
    assert abs(r_s["energies"]["Hubbard"] - r_c.energies["Hubbard"]) < 1e-6
