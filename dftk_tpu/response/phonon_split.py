"""Gamma-point DFPT dynamical matrices on the split (chip) engine.

All device code is real: the bare displacement perturbations (local
potential gradient + nonlocal dP terms) are assembled in split-complex
arithmetic, the Sternheimer solves run in the J-adapted realified algebra
(chi0_split), the Dyson screening uses the split kernel, and the response
assembly is a realified dot.  The clamped-ion part reuses the split force
energy (jax.hessian of _force_energy_split, chip-compatible) plus a
host-side f64 numpy Ewald hessian (finite differences of the analytic
gradient).  Insulators and metals (T > 0 occupation response included).

Validated against the complex dynmat_dfpt_gamma in
tests/test_phonon_split.py.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.engine_split import SplitTermsData
from ..ops.forces_split import SplitForceData, prepare_force_data
from .chi0_split import (SplitChi0Context, _dV_times_U, apply_chi0_split_ctx,
                         apply_kernel_split)
from .hessian import gmres


def _dvloc_grids_real(basis):
    """Real grids dV_loc/du_{s,alpha} [na, 3, n1,n2,n3] (numpy, f64)."""
    from .phonon_dfpt import _dVloc_grids
    return _dVloc_grids(basis)


def _bare_rhs_split(basis, ctx: SplitChi0Context, fd: SplitForceData,
                    dvloc_np, occupation_threshold=1e-8):
    """rhs[(s,alpha)] = realified (dH^{(s,alpha)} psi) [nk, nb, 2nG]."""
    sd = ctx.sd
    model = basis.model
    fft_size = basis.fft_size
    vol = model.unit_cell_volume
    dt = ctx.V.dtype
    U = ctx.U
    nG = sd.kin.shape[1]
    xy = jnp.stack([U[..., :nG], U[..., nG:]], axis=-1)
    na = dvloc_np.shape[0]

    rhs = []

    # nonlocal helper: P per atom = ff * sf(pos) / sqrt(vol), split algebra
    sqrt_vol = math.sqrt(vol)
    positions = np.stack(model.positions)

    def nl_terms(s, alpha):
        out_re = jnp.zeros(U.shape[:2] + (nG,), dtype=dt)
        out_im = jnp.zeros_like(out_re)
        for ff, D, group in zip(fd.ff_nl, fd.D_nl, fd.nl_groups):
            if s not in group:
                continue
            th = 2 * np.pi * (np.asarray(basis.Gred_np, dtype=float)
                              + np.asarray(basis.kcoords_spin)[:, None, :]) \
                @ positions[s]
            c, sn = jnp.asarray(np.cos(th), dtype=dt), \
                jnp.asarray(np.sin(th), dtype=dt)
            # P = ff * e^{-i th} / sqrt(vol)
            cN, snN = c[..., None], sn[..., None]
            P_re = (ff[..., 0] * cN + ff[..., 1] * snN) / sqrt_vol
            P_im = (-ff[..., 0] * snN + ff[..., 1] * cN) / sqrt_vol
            g = jnp.asarray(basis.Gpk_cart_np[:, :, alpha],
                            dtype=dt)[..., None]
            # dP = -i g P: (re, im) -> (g*im, -g*re)
            dP_re, dP_im = g * P_im, -g * P_re

            def pdag(Qr, Qi):
                # <Q_p | psi_n>: psi = x + i y
                cr = (jnp.einsum("kgp,kng->knp", Qr, xy[..., 0])
                      + jnp.einsum("kgp,kng->knp", Qi, xy[..., 1]))
                ci = (jnp.einsum("kgp,kng->knp", Qr, xy[..., 1])
                      - jnp.einsum("kgp,kng->knp", Qi, xy[..., 0]))
                return cr, ci

            Dr = D.astype(dt)
            cr, ci = pdag(P_re, P_im)
            Dc_r = jnp.einsum("pq,knq->knp", Dr, cr)
            Dc_i = jnp.einsum("pq,knq->knp", Dr, ci)
            dcr, dci = pdag(dP_re, dP_im)
            Ddc_r = jnp.einsum("pq,knq->knp", Dr, dcr)
            Ddc_i = jnp.einsum("pq,knq->knp", Dr, dci)

            def back(Qr, Qi, ar, ai):
                # sum_p Q_p * (ar + i ai)
                re = (jnp.einsum("kgp,knp->kng", Qr, ar)
                      - jnp.einsum("kgp,knp->kng", Qi, ai))
                im = (jnp.einsum("kgp,knp->kng", Qr, ai)
                      + jnp.einsum("kgp,knp->kng", Qi, ar))
                return re, im

            r1r, r1i = back(dP_re, dP_im, Dc_r, Dc_i)
            r2r, r2i = back(P_re, P_im, Ddc_r, Ddc_i)
            out_re = out_re + r1r + r2r
            out_im = out_im + r1i + r2i
        return out_re, out_im

    for s in range(na):
        for alpha in range(3):
            dv = jnp.asarray(dvloc_np[s, alpha], dtype=dt)[None]
            r = _dV_times_U(sd, dv, U, fft_size, vol)
            nr, ni = nl_terms(s, alpha)
            r = r + jnp.concatenate([nr, ni], axis=-1)
            rhs.append(r * jnp.concatenate([sd.mask, sd.mask],
                                           axis=-1)[:, None, :])
    return rhs


def _clamped_hessian_np(basis, psi, occ_w, rho):
    """Clamped-ion hessian of local + nonlocal energies, numpy f64.

    Reduced-coordinate second derivatives (both terms are diagonal in the
    atom index: each atom's energy is linear / quadratic in ITS structure
    factor alone).  psi complex [nk, nb, nG]; occ_w = kweights*occ.
    """
    import math as _math
    model = basis.model
    vol = model.unit_cell_volume
    sqrt_vol = _math.sqrt(vol)
    na = len(model.atoms)
    N = int(np.prod(basis.fft_size))
    H = np.zeros((na, 3, na, 3))

    # ---- local ---------------------------------------------------------------
    rho_G = np.fft.fftn(np.sum(rho, axis=0)).reshape(-1) * (sqrt_vol / N)
    Gred = basis.G_cube.reshape(-1, 3).astype(float)
    Gnorm = basis.G_cube_cart_norm.reshape(-1)
    for group_el in model.atom_groups:
        el = model.atoms[group_el[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = np.asarray(el.local_potential_fourier(Gnorm), dtype=float)
        for a in group_el:
            phase = np.exp(-2j * np.pi * (Gred @ model.positions[a]))
            base = ff * (np.conj(rho_G) * phase).real  # Re part after d^2
            # d2 e^{-2pi i G.x} -> -4 pi^2 G_i G_j e^{...}; Re picks cos part
            w2 = -4 * np.pi ** 2 * ff * (np.conj(rho_G) * phase).real
            H[a, :, a, :] += np.einsum("g,gi,gj->ij", w2 / sqrt_vol,
                                       Gred, Gred)

    # ---- nonlocal ------------------------------------------------------------
    from ..models.elements import ElementPsp
    from ..postprocess.forces import _projector_form_factors
    psi = np.asarray(psi)
    for group_el in model.atom_groups:
        el = model.atoms[group_el[0]]
        if not (isinstance(el, ElementPsp) and el.psp.n_proj() > 0):
            continue
        ff, D = _projector_form_factors(basis, el.psp)
        ff = np.asarray(ff)            # [nk, nG, npp] (no structure factor)
        D = np.asarray(D)
        Gred_pk = basis.Gred_np.astype(float) \
            + np.asarray(basis.kcoords_spin)[:, None, :]
        for a in group_el:
            sf = np.exp(-2j * np.pi * (Gred_pk @ model.positions[a]))
            cP = np.conj(ff * sf[:, :, None]) / sqrt_vol   # conj(P)
            c = np.einsum("kgp,kng->knp", cP, psi)
            dfac = 2j * np.pi * Gred_pk                     # d conj(P)/dx_i
            dc = np.einsum("kgi,kgp,kng->kinp", dfac, cP, psi)
            d2fac = np.einsum("kgi,kgj->kgij", dfac, dfac)
            d2c = np.einsum("kgij,kgp,kng->kijnp", d2fac, cP, psi)
            Dc = np.einsum("pq,knq->knp", D, c)
            term1 = 2 * np.einsum("kijnp,knp,kn->ij", np.conj(d2c), Dc,
                                  occ_w).real
            Ddc = np.einsum("pq,kjnq->kjnp", D, dc)
            term2 = 2 * np.einsum("kinp,kjnp,kn->ij", np.conj(dc), Ddc,
                                  occ_w).real
            H[a, :, a, :] += term1 + term2
    return H


def dynmat_dfpt_gamma_split(basis, sd: SplitTermsData, split_res,
                            tol=1e-6, sternheimer_tol=None,
                            acoustic_sum_rule=True, band_chunk=None):
    """Cartesian force-constant matrix [3na, 3na] at Gamma, split engine.

    split_res: result dict of self_consistent_field_split (csplit repr).
    Insulators AND metals (T > 0: chi0_split supplies the occupation /
    Fermi-level response and the divided-difference band pairs; the
    free-energy second derivative adds sum w df <psi|dV|psi> like the
    complex path, de Gironcoli PRB 51, 6773).  Full (unfolded) k-set in
    `basis`.
    """
    from .chi0_split import make_chi0_split_context
    model = basis.model
    metallic = model.temperature > 0
    na = len(model.atoms)
    ctx = make_chi0_split_context(basis, sd, split_res)
    dt = ctx.V.dtype
    if sternheimer_tol is None:
        sternheimer_tol = 1e-10 if dt == jnp.float64 else 1e-5
    rho0 = jnp.asarray(split_res["rho"], dtype=dt)
    fd = prepare_force_data(basis, dtype=dt)

    # ---- clamped-ion part: host-side f64 numpy (the f32 AD hessian was
    # the dominant error of the all-f32 pipeline) + numpy Ewald hessian
    nG = sd.kin.shape[1]
    U = ctx.U
    occ = ctx.occupation
    wocc_np = np.asarray(sd.kweights)[:, None] * np.asarray(occ,
                                                            dtype=float)
    U_np = np.asarray(jax.device_get(U), dtype=np.float64)
    psi_c = U_np[..., :nG] + 1j * U_np[..., nG:]
    rho_np = np.asarray(jax.device_get(rho0), dtype=np.float64)
    if basis.terms.rho_core_np is not None:
        raise NotImplementedError("split DFPT with NLCC psps not wired")
    H_el = _clamped_hessian_np(basis, psi_c, wocc_np, rho_np)
    # Ewald hessian: central differences of the analytic f64 gradient
    from ..ops.ewald import ewald_position_gradient_np
    charges = np.array([at.charge_ionic() for at in model.atoms],
                       dtype=float)
    pos_np = np.stack(model.positions)
    h = 1e-5
    H_ew = np.zeros((na, 3, na, 3))
    for b in range(na):
        for j in range(3):
            pp = pos_np.copy(); pp[b, j] += h
            pm = pos_np.copy(); pm[b, j] -= h
            gp = ewald_position_gradient_np(model.lattice, charges, pp)
            gm = ewald_position_gradient_np(model.lattice, charges, pm)
            H_ew[:, :, b, j] = (gp - gm) / (2 * h)
    H_red = H_el + H_ew
    Linv = np.linalg.inv(model.lattice)
    C = np.einsum("aA,satb,bB->sAtB", Linv, H_red, Linv)

    # ---- response part ------------------------------------------------------
    dvloc = _dvloc_grids_real(basis)
    rhs_list = _bare_rhs_split(basis, ctx, fd, dvloc)

    # ctx/sd ride as jit ARGUMENTS: closed-over device arrays become HLO
    # constants, which remote compile services reject for big states
    _chi0_rhs_j = jax.jit(lambda c_, r: apply_chi0_split_ctx(
        basis, c_, rhs=r, tol=sternheimer_tol, band_chunk=band_chunk))
    _chi0_dv_j = jax.jit(lambda c_, dv: apply_chi0_split_ctx(
        basis, c_, dv, tol=sternheimer_tol, band_chunk=band_chunk))
    _kern_j = jax.jit(lambda sd_, r0_, dr: apply_kernel_split(
        basis, sd_, r0_, dr))
    chi0_f = lambda r: _chi0_rhs_j(ctx, r)
    chi0_dv = lambda dv: _chi0_dv_j(ctx, dv)
    kern_f = lambda dr: _kern_j(sd, rho0, dr)

    def matvec(drho):
        return drho - chi0_dv(kern_f(drho))

    occ_mask = occ > 1e-8

    @jax.jit
    def _screened_j(ctx_, rhs, drho):
        """dpsi (incl. metallic pair terms) and df for the screened
        perturbation rhs_tot = rhs + K drho applied to psi."""
        dV_ind = apply_kernel_split(basis, ctx_.sd, rho0, drho)
        rhs_tot = rhs + _dV_times_U(ctx_.sd, dV_ind, ctx_.U, basis.fft_size,
                                    model.unit_cell_volume)
        _, dpsi, df, _ = apply_chi0_split_ctx(
            basis, ctx_, rhs=rhs_tot, tol=sternheimer_tol,
            band_chunk=band_chunk, with_detail=True)
        return dpsi, df

    dpsi_all, df_all = [], []
    for rhs in rhs_list:
        drho_bare = chi0_f(rhs)
        drho = gmres(matvec, drho_bare, tol=tol)
        dpsi, df = _screened_j(ctx, rhs, drho)
        dpsi_all.append(dpsi)
        df_all.append(df)

    from ..ops.eigen.csplit import cgram
    w = sd.kweights[:, None] * jnp.where(occ_mask, occ, 0.0)
    wk = sd.kweights[:, None]
    C_resp = np.zeros((3 * na, 3 * na))
    for s in range(3 * na):
        dVnn_s = None
        if metallic:
            Gr_s, _ = cgram(ctx.U, rhs_list[s])
            dVnn_s = jnp.einsum("kmm->km", Gr_s)   # Re<psi_n|d_s H|psi_n>
        for t in range(3 * na):
            # 2 Re<dpsi_t, rhs_s> = 2 * realified dot
            ov = jnp.einsum("kng,kng->kn", dpsi_all[t], rhs_list[s])
            val = 2.0 * jnp.sum(w * ov)
            if metallic:
                # occupation response of the free energy (de Gironcoli)
                val = val + jnp.sum(wk * df_all[t] * dVnn_s)
            C_resp[s, t] = float(val)
    C = C.reshape(3 * na, 3 * na) + C_resp
    C = (C + C.T) / 2
    if acoustic_sum_rule:
        blocks = C.reshape(na, 3, na, 3)
        corr = blocks.sum(axis=2)
        for s in range(na):
            blocks[s, :, s, :] -= corr[s]
        C = blocks.reshape(3 * na, 3 * na)
    return C
