"""Reduced floating-point precision: the f32 split engine.

Mirrors the reference examples/arbitrary_floattype.jl (Model{Float32}):
dftk_tpu's analogue of running a calculation in Float32 is the split-real
engine (ops/engine_split.py) with dtype=float32 — complex-free f32 device
code, the exact configuration the TPU chip benchmark runs.  The f32
energy lands within the expected envelope of the f64 answer, at a
fraction of the memory traffic.
"""
import jax.numpy as jnp
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.ops.engine_split import self_consistent_field_split


def main():
    a = 5.131570667152971
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0.0]])
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    model = dftk.model_DFT(lattice, [Si, Si],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(1, 1, 1),
                                fft_size=(18, 18, 18))

    # f64 reference (complex driver)
    res64 = dftk.self_consistent_field(basis, tol=1e-9,
                                       is_converged="energy")

    # f32 split engine (the TPU production configuration)
    res32 = self_consistent_field_split(basis, tol=1e-6, maxiter=40,
                                        dtype=jnp.float32,
                                        is_converged="energy")
    E64, E32 = res64.total_energy, float(res32["energies"]["total"])
    print(f"f64: E = {E64:.10f}")
    print(f"f32: E = {E32:.10f}   |dE| = {abs(E64 - E32):.2e}")
    assert abs(E64 - E32) < 2e-3          # measured f32 envelope
    assert np.asarray(res32["U"]).dtype == np.float32
    return res64, res32


if __name__ == "__main__":
    main()
