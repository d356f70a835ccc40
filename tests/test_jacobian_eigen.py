"""Eigenvalues of the SCF Jacobian Omega(+K) on the tangent space.

Mirrors reference test/compute_jacobian_eigen.jl: for the linear (atomic,
no XC/Hartree response) model the smallest eigenvalue of Omega IS the
HOMO-LUMO gap; with the full K coupling at an LDA ground state the
spectrum stays positive (SCF stability)."""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.response.hessian import eigen_omega_plus_k
from testcases import silicon


def _converged(model_fn, **kwargs):
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    m = model_fn(silicon["lattice"], [Si, Si], silicon["positions"], **kwargs)
    b = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(1, 1, 1))
    r = dftk.self_consistent_field(b, tol=1e-8, n_bands=6)
    psi = np.asarray(r.psi)[:, :4]
    occ = np.asarray(r.occupation)[:, :4]
    return b, r, psi, occ


def test_smallest_omega_eigenvalue_is_gap():
    b, r, psi, occ = _converged(dftk.model_atomic)
    gap = float(r.eigenvalues[0, 4] - r.eigenvalues[0, 3])
    lam, vecs = eigen_omega_plus_k(b, psi, occ, n_eigs=3, include_K=False,
                                   tol=1e-8)
    assert abs(lam[0] - gap) < 1e-5          # reference bar
    assert lam[0] > 1e-3
    # eigenvectors live in the tangent space
    ov = np.einsum("kng,kmg->nm", psi.conj(), np.asarray(vecs[0]))
    assert np.abs(ov).max() < 1e-8


def test_omega_plus_k_positive_at_lda_minimum():
    b, r, psi, occ = _converged(dftk.model_DFT, functionals="LDA")
    lam, _ = eigen_omega_plus_k(b, psi, occ, n_eigs=3, include_K=True,
                                tol=1e-6)
    assert lam[0] > 1e-3                      # stable ground state
