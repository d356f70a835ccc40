"""Density-density response: apply chi_0 via Sternheimer equations.

Mirrors DFTK `src/response/chi0.jl`:
  * sternheimer_solver (chi0.jl:115-283): for every occupied band solve the
    projected linear system
        P_c (H_k - eps_n) P_c  delta_psi_n = - P_c (delta_V psi_n)
    with P_c = 1 - sum_occ |psi><psi| and a Teter preconditioner; here the
    solve is a *batched* preconditioned CG over all (k, band) pairs at once
    (fixed-shape lax.while_loop) instead of a per-band loop.  The computed
    UNOCCUPIED bands enter through the Schur complement of the projected
    operator (chi0.jl:136-227): their subspace is inverted exactly from the
    known Rayleigh quotients, which both deflates the CG and captures the
    near-Fermi response that converges slowest.
  * apply_chi0 (chi0.jl:440-555): delta_rho from delta_V, including the
    metallic terms: diagonal occupation response
        delta_f_n = filled * f'((eps_n - epsF)/T)/T * (<psi|dV|psi> - d epsF)
    with the Fermi-level shift keeping the electron count fixed, and the
    explicit band-pair terms among partially occupied bands using the
    STABLE divided-difference coefficients (chi0.jl:284-310):
        alpha_mn = ratio * f_n / (f_n^2 + f_m^2),
        ratio    = (f_m - f_n)/(eps_m - eps_n)  (divided difference).
  * per-band adaptive tolerances (chi0.jl:560-663, BandtolBalanced of
    arxiv 2505.02319): band n converges to tol_n ~ density_tol/(2 f_n ...),
    so barely-occupied bands stop early.

Everything is differentiable jnp, so the same code path powers phonons /
polarizabilities and custom-vjp SCF derivatives.
"""
import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamiltonian as hamops
from ..ops.density import compute_density


def _project_out(x, psi):
    """x - sum_n |psi_n><psi_n | x_m>  over the band axis of psi.

    Rows of psi that are zero (masked padding) project onto nothing, so a
    fixed-shape masked band set needs no special casing.
    """
    ov = jnp.einsum("kng,kmg->knm", psi.conj(), x)
    return x - jnp.einsum("knm,kng->kmg", ov, psi)


def sternheimer_solver(apply_H, psi_occ, eps_occ, rhs, kin, mask,
                       tol=1e-9, maxiter=200,
                       psi_extra=None, eps_extra=None, extra_mask=None,
                       tol_bands=None):
    """Solve P_c (H - eps_n) P_c dpsi_n = -P_c rhs_n for all (k, n) at once.

    psi_occ [nk, no, nG]; eps_occ [nk, no]; rhs [nk, no, nG].
    psi_extra [nk, ne, nG] (optional): computed unoccupied bands; their
    subspace is handled by an exact Schur complement (Rayleigh quotients
    eps_extra, validity mask extra_mask) instead of CG iterations.
    tol_bands [nk, no] (optional) overrides the scalar tol per band.
    Returns dpsi [nk, no, nG] orthogonal to the occupied space.
    """
    mask3 = mask[:, None, :]
    use_schur = psi_extra is not None and psi_extra.shape[1] > 0

    def Q(x):
        return _project_out(x, psi_occ) * mask3

    if use_schur:
        em = extra_mask if extra_mask is not None \
            else jnp.ones(psi_extra.shape[:2], bool)
        psi_ex = psi_extra * em[:, :, None]
        H_psi_ex = apply_H(psi_ex) * em[:, :, None]
        # inv[k, m, n] = extra_mask / (eps_extra_m - eps_n); the Schur block
        # is diagonal because the extra bands are Rayleigh-Ritzed
        diff = eps_extra[:, :, None] - eps_occ[:, None, :]
        diff = jnp.where(jnp.abs(diff) > 1e-10, diff,
                         jnp.where(diff >= 0, 1e-10, -1e-10))
        inv = jnp.where(em[:, :, None], 1.0 / diff, 0.0)

        def R(x):
            return (_project_out(_project_out(x, psi_occ), psi_ex)) * mask3

        def Hshift(x):
            return apply_H(x) - eps_occ[:, :, None].astype(x.dtype) * x

        def A(x):
            y = R(x)
            hy = Hshift(y)
            s = jnp.einsum("kmg,kng->kmn", H_psi_ex.conj(), y)
            hy = hy - jnp.einsum("kmg,kmn->kng", H_psi_ex,
                                 inv.astype(x.dtype) * s)
            return R(hy)

        b = -Q(rhs)
        sb = jnp.einsum("kmg,kng->kmn", psi_ex.conj(), b)
        bb = R(b - jnp.einsum("kmg,kmn->kng", H_psi_ex,
                              inv.astype(b.dtype) * sb))
        proj = R
    else:
        def A(x):
            hx = apply_H(x) - eps_occ[:, :, None].astype(x.dtype) * x
            return Q(hx)

        b = -Q(rhs)
        bb = b
        proj = Q

    # TPA-style preconditioner shifted per band
    mean_kin = jnp.maximum(
        jnp.einsum("kng,kg,kng->kn", psi_occ.conj(), kin, psi_occ).real, 1e-12)

    def M(x):
        return proj(x * (mean_kin[:, :, None]
                         / (mean_kin[:, :, None] + kin[:, None, :] + 1e-20)))

    tol_b = tol_bands if tol_bands is not None \
        else jnp.full(eps_occ.shape, tol)

    x = jnp.zeros_like(bb)
    r = bb
    z = M(r)
    p = z
    rz = jnp.einsum("kng,kng->kn", r.conj(), z).real

    def body(state):
        x, r, z, p, rz, it = state
        Ap = A(p)
        pAp = jnp.einsum("kng,kng->kn", p.conj(), Ap).real
        alpha = jnp.where(jnp.abs(pAp) > 1e-30, rz / pAp, 0.0)
        x = x + alpha[:, :, None].astype(x.dtype) * p
        r = r - alpha[:, :, None].astype(x.dtype) * Ap
        z = M(r)
        rz_new = jnp.einsum("kng,kng->kn", r.conj(), z).real
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = z + beta[:, :, None].astype(x.dtype) * p
        return x, r, z, p, rz_new, it + 1

    def cond(state):
        _, r, _, _, _, it = state
        res = jnp.linalg.norm(r, axis=-1)
        return jnp.logical_and(it < maxiter, jnp.any(res > tol_b))

    state = jax.lax.while_loop(cond, body, (x, r, z, p, rz, jnp.asarray(0)))
    dpsiR = proj(state[0])

    if use_schur:
        # recover the extra-band component:
        # alpha[m, n] = inv[m, n] <psi_ex_m | (b - (H - eps_n) dpsiR)_n>
        resid = b - Hshift(dpsiR)
        s = jnp.einsum("kmg,kng->kmn", psi_ex.conj(), resid)
        dpsi = dpsiR + jnp.einsum("kmg,kmn->kng", psi_ex,
                                  inv.astype(dpsiR.dtype) * s)
        return dpsi * mask3
    return dpsiR


def balanced_band_tolerances(basis, occ_w, occ_mask, density_tol,
                             tol_min=1e-14, tol_max=1e-2):
    """BandtolBalanced of arxiv 2505.02319 (reference chi0.jl:588-663):
    tol_n = density_tol * Omega / (sqrt(Ng) Nocc_k 2 f_n Nk w_k), clamped.
    occ_w [nk, nb] actual occupations (0 where masked)."""
    vol = basis.model.unit_cell_volume
    Ng = float(np.prod(basis.fft_size))
    nk = basis.n_kpoints
    w = jnp.asarray(basis.kweights)[:, None]
    nocc_k = jnp.maximum(jnp.sum(occ_mask, axis=1, keepdims=True), 1)
    fac = vol / (math.sqrt(Ng) * nocc_k * 2.0
                 * jnp.maximum(occ_w, 1e-8) * nk * w)
    tols = jnp.clip(density_tol * fac, tol_min, tol_max)
    return jnp.where(occ_mask, tols, tol_max)


class Chi0Context(NamedTuple):
    """Fixed SCF state needed to apply chi_0 (a jit-able closure bundle)."""
    ham: hamops.Ham
    psi: jnp.ndarray           # [nk, nb, nG]
    occupation: jnp.ndarray    # [nk, nb]
    eigenvalues: jnp.ndarray   # [nk, nb]
    epsF: jnp.ndarray


def make_chi0_context(scfres, basis=None):
    basis = basis or scfres.basis
    model = basis.model
    terms = basis.terms
    import jax.numpy as jnp
    rho = scfres.rho
    Gcart = jnp.asarray(basis.G_cube_cart)
    V, _ = hamops.total_potential(terms, rho, Gcart, model.unit_cell_volume)
    ham = hamops.build_ham(basis.data, terms.data, V)
    return Chi0Context(ham=ham, psi=jnp.asarray(scfres.psi),
                       occupation=jnp.asarray(scfres.occupation),
                       eigenvalues=jnp.asarray(scfres.eigenvalues),
                       epsF=jnp.asarray(scfres.epsF))


def apply_chi0(ctx: Chi0Context, basis, delta_V, tol=1e-9,
               occupation_threshold=1e-8, use_schur=True,
               density_tol=None):
    """delta_rho = chi_0 delta_V  (adiabatic density response).

    delta_V [nspin, n1,n2,n3] real; returns delta_rho of the same shape.
    Includes the metallic occupation/Fermi-level response and the explicit
    divided-difference band-pair terms when T > 0.  use_schur engages the
    computed unoccupied bands as an exact Schur complement in the
    Sternheimer solve; density_tol switches to per-band balanced
    tolerances targeting that density accuracy.
    """
    bd = basis.data
    fft_size = basis.fft_size
    psi = ctx.psi

    # delta_V * psi in the plane-wave basis
    dV_k = delta_V[bd.kspin]                           # [nk, grid]
    from ..ops import fft as fftops
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
    dVpsir = dV_k[:, None] * psir
    dVpsi = jax.vmap(fftops.gather_from_cube)(
        jnp.fft.fftn(dVpsir, axes=(-3, -2, -1)), bd.Gidx, bd.mask)
    return apply_chi0_generic(ctx, basis, dVpsi, tol=tol,
                              occupation_threshold=occupation_threshold,
                              use_schur=use_schur, density_tol=density_tol)


def apply_chi0_generic(ctx: Chi0Context, basis, dVpsi, tol=1e-9,
                       occupation_threshold=1e-8, use_schur=True,
                       density_tol=None, with_detail=False):
    """chi_0 response to a GENERAL Hermitian perturbation given as
    dVpsi = dH psi [nk, nb, nG] (e.g. displacement perturbations with
    their nonlocal parts).  Returns delta_rho; with_detail=True returns
    (delta_rho, dpsi, df, depsF) for free-energy second derivatives
    (metallic phonons)."""
    model = basis.model
    bd = basis.data
    fft_size = basis.fft_size
    vol = model.unit_cell_volume
    nspin = model.n_spin_components
    filled = model.filled_occupation
    T = model.temperature

    psi, occ, eps = ctx.psi, ctx.occupation, ctx.eigenvalues
    nk, nb, nG = psi.shape
    apply = lambda p: hamops.apply_H(ctx.ham, p, fft_size, vol)

    from ..ops import fft as fftops
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))

    # ---- band splitting ------------------------------------------------------
    # "occupied" = response solved for (f > threshold); the other computed
    # bands act as the Schur/deflation space of the Sternheimer solve.
    occ_mask = occ > occupation_threshold
    occ_w = jnp.where(occ_mask, occ, 0.0)
    psi_occ = psi * occ_mask[:, :, None]
    rhs = dVpsi * occ_mask[:, :, None]

    extra_mask = ~occ_mask
    psi_extra = (psi * extra_mask[:, :, None]) if use_schur else None

    tol_bands = None
    if density_tol is not None:
        tol_bands = balanced_band_tolerances(basis, occ_w, occ_mask,
                                             density_tol)

    # ---- wavefunction (Sternheimer) response of occupied bands ---------------
    dpsi = sternheimer_solver(
        apply, psi_occ, eps, rhs, ctx.ham.kin, bd.mask, tol=tol,
        psi_extra=psi_extra, eps_extra=eps if use_schur else None,
        extra_mask=extra_mask if use_schur else None, tol_bands=tol_bands)
    dpsi = dpsi * occ_mask[:, :, None]

    # ---- explicit divided-difference band-pair terms (metals, T > 0) --------
    # (reference chi0.jl:399-412 + compute_alpha_mn).  Among partially
    # occupied bands the Sternheimer projector removes the pair response;
    # it is restored explicitly with the stable alpha_mn coefficients.
    if T > 0 and model.smearing is not None:
        from ..models.smearing import (NoSmearing,
                                       occupation_divided_difference)
        if not isinstance(model.smearing, NoSmearing):
            em = eps[:, :, None]                       # [k, m, 1]
            en = eps[:, None, :]                       # [k, 1, n]
            ratio = occupation_divided_difference(
                model.smearing, em * jnp.ones_like(en),
                en * jnp.ones_like(em), ctx.epsF, T) * filled
            fm = occ[:, :, None]
            fn = occ[:, None, :]
            alpha = ratio * fn / jnp.maximum(fn ** 2 + fm ** 2, 1e-30)
            # pairs restricted to the solved set; m == n handled by delta_f
            pair_mask = (occ_mask[:, :, None] & occ_mask[:, None, :]
                         & ~jnp.eye(nb, dtype=bool)[None])
            alpha = jnp.where(pair_mask, alpha, 0.0)
            dots = jnp.einsum("kmg,kng->kmn", psi.conj(), dVpsi)
            dpsi = dpsi + jnp.einsum("kmn,kmg->kng",
                                     alpha.astype(dots.dtype) * dots, psi) \
                * occ_mask[:, :, None]

    # delta_rho from wavefunction response: sum 2 w f Re(psi* dpsi)(r)
    dcube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                     )(dpsi, bd.Gidx, bd.mask)
    dpsir = jnp.fft.ifftn(dcube, axes=(-3, -2, -1))
    N = int(np.prod(fft_size))
    scale = (N / math.sqrt(vol)) ** 2
    contrib = 2 * scale * (psir.conj() * dpsir).real
    w = bd.kweights[:, None] * occ_w
    drho_k = jnp.einsum("kn,knxyz->kxyz", w, contrib)

    if nspin == 1:
        drho = jnp.sum(drho_k, axis=0)[None]
    else:
        sel = jax.nn.one_hot(bd.kspin, nspin, dtype=drho_k.dtype)
        drho = jnp.einsum("ks,kxyz->sxyz", sel, drho_k)

    # ---- metallic occupation response ---------------------------------------
    df = jnp.zeros_like(occ)
    depsF = jnp.asarray(0.0)
    if T > 0:
        smearing = model.smearing
        x = (eps - ctx.epsF) / T
        fprime = jax.vmap(jax.vmap(jax.grad(
            lambda t: smearing.occupation(t))))(x) / T      # df/d eps
        dVnn = jnp.einsum("kng,kng->kn", psi.conj(), dVpsi).real
        # Fermi-level shift keeping the electron count fixed:
        # sum_kn w filled f' (dVnn - depsF) = 0
        den = jnp.sum(bd.kweights[:, None] * filled * fprime)
        num = jnp.sum(bd.kweights[:, None] * filled * fprime * dVnn)
        depsF = jnp.where(jnp.abs(den) > 1e-14, num / den, 0.0)
        df = filled * fprime * (dVnn - depsF)
        psir2 = scale * (psir.conj() * psir).real
        drho_occ_k = jnp.einsum("kn,knxyz->kxyz",
                                bd.kweights[:, None] * df, psir2)
        if nspin == 1:
            drho = drho + jnp.sum(drho_occ_k, axis=0)[None]
        else:
            sel = jax.nn.one_hot(bd.kspin, nspin, dtype=drho_occ_k.dtype)
            drho = drho + jnp.einsum("ks,kxyz->sxyz", sel, drho_occ_k)

    if with_detail:
        return drho, dpsi, df, depsF
    return drho
