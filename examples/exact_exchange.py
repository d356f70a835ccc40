"""Exact exchange on a k-point grid (BEYOND the reference).

The reference restricts Fock exchange to Gamma-point-only calculations
(src/terms/exact_exchange.jl:52) and names the k-point generalisation a
TODO (line 31).  dftk_tpu implements it: exchange kernels are evaluated
on the shifted grids G + (k - k') (ops/coulomb.py:exx_q_kernels) and the
generator sum runs over the full same-spin k' list.

The validation is built into the physics: a Hartree-Fock calculation of
one He atom with a 2-point k-grid spans the identical variational space
as the Gamma calculation of the doubled supercell, so the energies per
unit cell must agree to solver tolerance.  (A fixed truncation radius
makes the exchange kernels of the two routes identical, not just
equivalent in the bulk limit.)
"""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.models.standard import _base_terms

L, RC, ECUT = 8.0, 4.0, 5.0


def hf_model(lattice, atoms, positions):
    terms = _base_terms(0.0) + [
        dftk.ExactExchange(scaling_factor=1.0,
                           kernel=dftk.SphericallyTruncatedCoulomb(rc=RC))]
    return dftk.Model(lattice, list(atoms), list(positions),
                      term_types=terms, symmetries=False)


def main():
    He = dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")

    # primitive cell, 2-point k-grid
    prim = hf_model(np.diag([L, L, L]), [He], [np.array([.5, .5, .5])])
    bp = dftk.PlaneWaveBasis(prim, Ecut=ECUT, kgrid=(2, 1, 1),
                             fft_size=(16, 16, 16))
    rp = dftk.self_consistent_field(bp, tol=1e-10, maxiter=60,
                                    is_converged="energy")

    # doubled supercell at Gamma: the same variational space
    sc = hf_model(np.diag([2 * L, L, L]), [He, He],
                  [np.array([.25, .5, .5]), np.array([.75, .5, .5])])
    bs = dftk.PlaneWaveBasis(sc, Ecut=ECUT, kgrid=(1, 1, 1),
                             fft_size=(32, 16, 16))
    rs = dftk.self_consistent_field(bs, tol=1e-10, maxiter=60,
                                    is_converged="energy")

    E_k = rp.total_energy
    E_sc = rs.total_energy / 2
    print(f"HF He, k-grid (2,1,1):      E = {E_k:.10f} Ha/cell")
    print(f"HF He, supercell at Gamma:  E = {E_sc:.10f} Ha/cell")
    print(f"k-point exchange folding error: {abs(E_k - E_sc):.2e}")
    assert abs(E_k - E_sc) < 1e-7
    print("Ex (k-grid):", float(rp.energies["ExactExchange"]))
    return rp, rs


if __name__ == "__main__":
    main()
