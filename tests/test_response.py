"""Response (DFPT) layer: chi_0, Dyson solver, polarizability vs FD.

Mirrors the reference's test/chi0.jl and the polarizability example.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk
from dftk_tpu.response.chi0 import apply_chi0, make_chi0_context
from dftk_tpu.response.hessian import (apply_kernel, compute_polarizability,
                                       solve_dyson)

A_BOX = 10.0


def _helium(eps_field=0.0, Ecut=8.0):
    lattice = np.eye(3) * A_BOX
    He = dftk.ElementPsp.from_symbol("He", psp="lda/he-q2")
    extra = ()
    if eps_field:
        def Vext(r_cart):
            return eps_field * (r_cart[..., 2] - A_BOX / 2)
        extra = (dftk.ExternalFromReal(Vext),)
    m = dftk.model_DFT(lattice, [He], [np.array([0.5, 0.5, 0.5])],
                       functionals=["lda_x", "lda_c_vwn"], symmetries=False,
                       extra_terms=extra)
    basis = dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=(1, 1, 1))
    return basis, dftk.self_consistent_field(basis, tol=1e-11, maxiter=60)


def _dipole(res, basis):
    r = np.einsum("ab,xyzb->xyza", basis.model.lattice,
                  basis.r_cube)[..., 2] - A_BOX / 2
    return float(np.sum(r * np.sum(np.asarray(res.rho), axis=0)) * basis.dvol)


def test_chi0_charge_conservation():
    """chi_0 of any perturbation integrates to zero (particle conservation)."""
    basis, res = _helium()
    ctx = make_chi0_context(res)
    rng = np.random.default_rng(0)
    dV = jnp.asarray(rng.normal(size=(1,) + basis.fft_size))
    drho = apply_chi0(ctx, basis, dV, tol=1e-10)
    assert abs(float(jnp.sum(drho)) * basis.dvol) < 1e-6


def test_chi0_negative_definite():
    """<dV, chi_0 dV> <= 0 for the static response."""
    basis, res = _helium()
    ctx = make_chi0_context(res)
    rng = np.random.default_rng(1)
    dV = jnp.asarray(rng.normal(size=(1,) + basis.fft_size))
    drho = apply_chi0(ctx, basis, dV, tol=1e-10)
    assert float(jnp.sum(dV * drho)) * basis.dvol < 0


def test_polarizability_vs_finite_difference():
    basis, res = _helium()
    alpha = compute_polarizability(res, direction=2, tol=1e-9)

    eps = 0.01
    bp, rp = _helium(+eps)
    bm, rm = _helium(-eps)
    fd = (_dipole(rp, bp) - _dipole(rm, bm)) / (2 * eps)
    # the FD perturbation is V=+eps(z-z0): the potential-energy convention
    # gives d mu / d eps = -alpha (electron density flows to low potential)
    assert fd < 0 and alpha > 0
    assert abs(alpha - (-fd)) / abs(fd) < 2e-2


def test_inexact_gmres_matches_exact():
    """Relaxed per-matvec Sternheimer tolerances give the same drho."""
    basis, res = _helium()
    r = basis.r_cube @ basis.model.lattice.T
    dV = (r[..., 2] - A_BOX / 2)[None]
    drho1, _ = solve_dyson(res, jnp.asarray(dV), tol=1e-8)
    drho2, _ = solve_dyson(res, jnp.asarray(dV), tol=1e-8, inexact=True)
    assert float(jnp.abs(drho1 - drho2).max()) < 1e-7
