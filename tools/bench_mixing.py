#!/usr/bin/env python
"""LdosMixing vs KerkerMixing iteration counts (VERDICT r2 weak item #6).

The reference defaults to LdosMixing (self_consistent_field.jl:170); our
driver defaults to Kerker for metals.  Measure both on fcc aluminium (the
canonical metal) and on the GaAs(110) slab-like charge-sloshing regime.

Usage: JAX_PLATFORMS=cpu python tools/bench_mixing.py
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# the TPU-tunnel plugin can override JAX_PLATFORMS at import; this wins
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import dftk_tpu as dftk

    a = 7.65339
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    Al = dftk.ElementPsp.from_symbol("Al", psp="lda/al-q3")
    model = dftk.model_DFT(lattice, [Al], [np.zeros(3)],
                           functionals=["lda_x", "lda_c_vwn"],
                           temperature=1e-3,
                           smearing=dftk.Smearing.Gaussian())
    for name, mixing in [("Kerker", dftk.KerkerMixing()),
                         ("KerkerDos", dftk.KerkerDosMixing()),
                         ("Ldos", dftk.LdosMixing())]:
        basis = dftk.PlaneWaveBasis(model, Ecut=10.0, kgrid=(4, 4, 4))
        res = dftk.self_consistent_field(basis, tol=1e-10, maxiter=60,
                                         mixing=mixing)
        print(f"Al  {name:10s}: n_iter={res.n_iter:3d} converged="
              f"{res.converged} E={res.total_energy:.10f}")

    from dftk_tpu.external.structure import build_model, build_surface_110
    s = build_surface_110(n_layers=2, n_vacuum=4)
    slab = build_model(s, functionals="PBE", psp_family="pbe",
                       temperature=1e-3, smearing=dftk.Smearing.Gaussian(),
                       symmetries=False)
    for name, mixing in [("Kerker", dftk.KerkerMixing()),
                         ("Ldos", dftk.LdosMixing())]:
        basis = dftk.PlaneWaveBasis(slab, Ecut=5.0, kgrid=(2, 2, 1))
        res = dftk.self_consistent_field(basis, tol=1e-8, maxiter=100,
                                         mixing=mixing, damping=0.5)
        print(f"slab {name:10s}: n_iter={res.n_iter:3d} converged="
              f"{res.converged} E={res.total_energy:.8f}")


if __name__ == "__main__":
    main()
