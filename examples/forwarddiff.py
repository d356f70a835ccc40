"""Algorithmic differentiation through the DFT total energy.

Mirrors the reference examples/forwarddiff.jl, the jax way: the energy
functional is pure and differentiable, so derivatives with respect to
ANY input come from jax.grad instead of finite differences.  Here: the
derivative of the silicon total energy with respect to a uniform lattice
dilation (the trace of the stress, up to volume factors), checked
against central finite differences of the SCF energy.
"""
import numpy as np

import dftk_tpu as dftk

A0 = 5.131570667152971


def scf_energy(scale):
    lattice = scale * np.array([[0, A0, A0], [A0, 0, A0], [A0, A0, 0.0]])
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    model = dftk.model_DFT(lattice, [Si, Si],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(2, 2, 2),
                                fft_size=(18, 18, 18))
    return dftk.self_consistent_field(basis, tol=1e-9,
                                      is_converged="energy")


def main():
    scfres = scf_energy(1.0)
    # AD route: stresses = (1/Omega) dE/d(strain) via jax.grad of the
    # energy functional at the converged (variational) state
    sigma = np.asarray(dftk.compute_stresses_cart(scfres))
    vol = scfres.basis.model.unit_cell_volume
    # uniform dilation L -> (1+e) L:  dE/de = trace(sigma) * Omega
    dE_AD = float(np.trace(sigma)) * vol

    h = 1e-3
    Ep = scf_energy(1 + h).total_energy
    Em = scf_energy(1 - h).total_energy
    dE_FD = (Ep - Em) / (2 * h)
    print(f"dE/d(dilation)  AD: {dE_AD:+.6f}   FD: {dE_FD:+.6f}   "
          f"|diff| = {abs(dE_AD - dE_FD):.2e}")
    assert abs(dE_AD - dE_FD) < 5e-3
    return dE_AD


if __name__ == "__main__":
    main()
