"""chi_0 / Sternheimer response in the split-real (complex-free) engine.

Chip-runnable linear response: the complex Sternheimer system
    P_c (H - eps_n) P_c dpsi_n = -P_c (dV psi_n)
is solved on realified vectors u = (x; y) (ops/eigen/csplit.py algebra):
the complex projector uses the J-structured Gram pair, the operator is the
split H apply, and the preconditioned CG runs on real arrays only -- so
apply_chi0 compiles on TPU backends without complex dtypes.  Insulators
(T = 0 response; the metallic occupation terms stay in the complex path).

Validated against the complex-f64 apply_chi0 (tests/test_chi0_split.py)
and measured on the real TPU chip.
"""
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.engine_split import (SplitTermsData, apply_H_split,
                                make_split_ham, total_potential_split)
from ..ops.eigen.csplit import apply_J, cgram


def _project_out_c(x, U_occ):
    """x - sum_n u_n <psi_n, phi>  in realified form.

    <psi_n, phi> = cr + i ci from the csplit Gram; the complex combination
    maps to cr*u + ci*J(u).
    """
    Gr, Gi = cgram(U_occ, x)              # [nk, no, nb]
    out = x - jnp.einsum("knm,kng->kmg", Gr, U_occ) \
        - jnp.einsum("knm,kng->kmg", Gi, apply_J(U_occ))
    return out


def sternheimer_split(apply_H, U_occ, eps_occ, rhs, kin2, mask2,
                      tol=1e-6, maxiter=200):
    """Batched preconditioned CG for the projected split-real system.

    U_occ [nk, no, 2nG] csplit occupied bands; eps_occ [nk, no];
    rhs [nk, no, 2nG] = realified (dV psi_n).  Returns dpsi (realified),
    orthogonal (complex sense) to the occupied space.
    """
    mask3 = mask2[:, None, :]

    def Pc(x):
        return _project_out_c(x, U_occ) * mask3

    b = -Pc(rhs)

    def A(x):
        hx = apply_H(x) - eps_occ[:, :, None].astype(x.dtype) * x
        return Pc(hx)

    mean_kin = jnp.maximum(
        jnp.einsum("kng,kg,kng->kn", U_occ, kin2, U_occ), 1e-12)

    def M(x):
        return x * (mean_kin[:, :, None]
                    / (mean_kin[:, :, None] + kin2[:, None, :] + 1e-20))

    x = jnp.zeros_like(b)
    r = b
    z = M(r)
    p = z
    rz = jnp.einsum("kng,kng->kn", r, z)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = A(p)
        pAp = jnp.einsum("kng,kng->kn", p, Ap)
        alpha = jnp.where(jnp.abs(pAp) > 1e-30, rz / pAp, 0.0)
        x = x + alpha[:, :, None] * p
        r = r - alpha[:, :, None] * Ap
        z = M(r)
        rz_new = jnp.einsum("kng,kng->kn", r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = z + beta[:, :, None] * p
        return x, r, z, p, rz_new, it + 1

    def cond(state):
        _, r, _, _, _, it = state
        resmax = jnp.max(jnp.linalg.norm(r, axis=-1))
        return jnp.logical_and(it < maxiter, resmax > tol)

    state = jax.lax.while_loop(cond, body, (x, r, z, p, rz, jnp.asarray(0)))
    return Pc(state[0])


def _dV_times_U(sd: SplitTermsData, dV, U, fft_size, volume):
    """Realified (dV psi) for a real grid potential dV [nspin, grid]."""
    from ..ops.engine_split import gather_cube_split, scatter_cube_split
    from ..kernels.dft_matmul import dft3
    nG = sd.kin.shape[1]
    xy = jnp.stack([U[..., :nG], U[..., nG:]], axis=-1)
    dV_k = dV[sd.kspin]                                   # [nk, grid]
    cube = scatter_cube_split(xy, sd.Gidx, sd.mask, fft_size)
    psir = dft3(cube, sign=+1)                            # [nk,nb,grid,2]
    prod = dV_k[:, None, :, :, :, None] * psir
    back = dft3(prod, sign=-1) / float(np.prod(fft_size))
    out = gather_cube_split(back, sd.Gidx, sd.mask)       # [nk,nb,nG,2]
    return jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)


class SplitChi0Context(NamedTuple):
    """Bundle for repeated chi0 applies at a fixed split-SCF state."""
    sd: SplitTermsData
    V: jnp.ndarray
    U: jnp.ndarray
    occupation: jnp.ndarray
    eigenvalues: jnp.ndarray
    kin2: jnp.ndarray
    mask2: jnp.ndarray
    epsF: jnp.ndarray = None


def make_chi0_split_context(basis, sd: SplitTermsData, split_res):
    """Build the context from a self_consistent_field_split result dict.

    Requires the csplit band representation (band_repr="complex", the
    default): one U row per physical band with full occupation f."""
    rho = jnp.asarray(split_res["rho"])
    V, _ = total_potential_split(basis.terms, sd, rho,
                                 basis.model.unit_cell_volume)
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    kin2 = jnp.concatenate([sd.kin, sd.kin], axis=-1)
    return SplitChi0Context(
        sd=sd, V=V, U=jnp.asarray(split_res["U"]),
        occupation=jnp.asarray(split_res["occupation"], dtype=V.dtype),
        eigenvalues=jnp.asarray(split_res["eigenvalues"], dtype=V.dtype),
        kin2=kin2, mask2=mask2,
        epsF=jnp.asarray(split_res.get("epsF", 0.0), dtype=V.dtype))


def apply_chi0_split_ctx(basis, ctx: SplitChi0Context, delta_V=None,
                         tol=1e-6, occupation_threshold=1e-8,
                         band_chunk=None, rhs=None, with_detail=False):
    """delta_rho = chi_0 delta_V, all-real device code.

    Either delta_V [nspin, grid] (a local potential perturbation) or a
    general realified rhs = dH psi [nk, nb, 2nG] may be given (e.g. the
    displacement perturbations of the phonon DFPT).

    T > 0 (metals) includes the occupation/Fermi-level response and the
    stable divided-difference band-pair terms among partially occupied
    bands (split port of response/chi0.py:277-341, reference
    src/response/chi0.jl:399-412,440-555).  with_detail=True additionally
    returns (dpsi, df, depsF) for free-energy second derivatives."""
    model = basis.model
    fft_size = basis.fft_size
    volume = model.unit_cell_volume
    nspin = model.n_spin_components
    filled = model.filled_occupation
    T = model.temperature
    sd = ctx.sd
    dt = ctx.V.dtype

    occ = ctx.occupation
    occ_mask = occ > occupation_threshold
    U_occ = ctx.U * occ_mask[:, :, None]
    occ_w = jnp.where(occ_mask, occ, 0.0)

    ham = make_split_ham(sd, ctx.V)
    A = lambda u: apply_H_split(ham, u, fft_size, volume,
                                band_chunk=band_chunk)

    if rhs is None:
        # perturbation applied to ALL computed bands: the metallic
        # occupation response needs the diagonal on every band, the CG
        # right-hand side is occ-masked separately below
        dVj = jnp.asarray(delta_V, dtype=dt)
        rhs = _dV_times_U(sd, dVj, ctx.U if T > 0 else U_occ,
                          fft_size, volume)
    rhs_cg = rhs * occ_mask[:, :, None]
    dpsi = sternheimer_split(A, U_occ, ctx.eigenvalues, rhs_cg, ctx.kin2,
                             ctx.mask2, tol=tol)
    dpsi = dpsi * occ_mask[:, :, None]

    # dots_mn = <psi_m, dH psi_n> as a split pair (needed by the metallic
    # pair terms AND the occupation response diagonal)
    Gr = Gi = None
    if T > 0:
        Gr, Gi = cgram(ctx.U, rhs)                     # [nk, m, n]

    # ---- divided-difference band-pair terms (metals, T > 0) ----------------
    # split port of response/chi0.py:277-300: the Sternheimer projector
    # removes the pair response among partially occupied bands; restore it
    # with the stable alpha_mn, acting as the complex coefficient
    # alpha*dots on u_m (re part on u, im part on J u).
    if T > 0 and model.smearing is not None:
        from ..models.smearing import (NoSmearing,
                                       occupation_divided_difference)
        if not isinstance(model.smearing, NoSmearing):
            eps = ctx.eigenvalues
            nb = eps.shape[1]
            em = eps[:, :, None]
            en = eps[:, None, :]
            ratio = occupation_divided_difference(
                model.smearing, em * jnp.ones_like(en),
                en * jnp.ones_like(em), ctx.epsF, T) * filled
            fm = occ[:, :, None]
            fn = occ[:, None, :]
            alpha = ratio * fn / jnp.maximum(fn ** 2 + fm ** 2, 1e-30)
            pair_mask = (occ_mask[:, :, None] & occ_mask[:, None, :]
                         & ~jnp.eye(nb, dtype=bool)[None])
            alpha = jnp.where(pair_mask, alpha, 0.0).astype(dt)
            dpsi = dpsi + (jnp.einsum("kmn,kmg->kng", alpha * Gr, ctx.U)
                           + jnp.einsum("kmn,kmg->kng", alpha * Gi,
                                        apply_J(ctx.U))) \
                * occ_mask[:, :, None]

    # drho = sum 2 w f Re(psi* dpsi)(r): split real-space fields
    from ..ops.engine_split import scatter_cube_split
    from ..kernels.dft_matmul import dft3
    nG = sd.kin.shape[1]

    def to_real(Uv):
        xy = jnp.stack([Uv[..., :nG], Uv[..., nG:]], axis=-1)
        cube = scatter_cube_split(xy, sd.Gidx, sd.mask, fft_size)
        return dft3(cube, sign=+1)                     # [nk, nb, grid, 2]

    psir = to_real(U_occ)          # = N * ifftn values
    dpsir = to_real(dpsi)
    # complex formula: 2 (N/sqrt(vol))^2 Re(psi* dpsi) with ifftn-scaled
    # fields; to_real carries an extra factor N each -> net 2/vol
    re_prod = jnp.sum(psir * dpsir, axis=-1)
    w = sd.kweights[:, None] * occ_w
    drho_k = (2.0 / volume) * jnp.einsum("kn,knxyz->kxyz", w, re_prod)
    if nspin == 1:
        drho = jnp.sum(drho_k, axis=0)[None]
    else:
        sel = jax.nn.one_hot(sd.kspin, nspin, dtype=drho_k.dtype)
        drho = jnp.einsum("ks,kxyz->sxyz", sel, drho_k)

    # ---- metallic occupation / Fermi-level response ------------------------
    # split port of response/chi0.py:318-340: df_n = filled f' (dVnn-depsF)
    # with depsF fixing the electron count; adds df_n |psi_n(r)|^2.
    df = jnp.zeros_like(occ)
    depsF = jnp.asarray(0.0, dtype=dt)
    if T > 0:
        smearing = model.smearing
        x = (ctx.eigenvalues - ctx.epsF) / T
        fprime = jax.vmap(jax.vmap(jax.grad(
            lambda t: smearing.occupation(t))))(x) / T
        dVnn = jnp.einsum("kmm->km", Gr)               # Re<psi_n, dH psi_n>
        den = jnp.sum(sd.kweights[:, None] * filled * fprime)
        num = jnp.sum(sd.kweights[:, None] * filled * fprime * dVnn)
        depsF = jnp.where(jnp.abs(den) > 1e-14, num / den, 0.0)
        df = filled * fprime * (dVnn - depsF)
        psir2 = jnp.sum(psir * psir, axis=-1)          # N^2 |ifft psi|^2
        drho_occ_k = (1.0 / volume) * jnp.einsum(
            "kn,knxyz->kxyz", sd.kweights[:, None] * df, psir2)
        if nspin == 1:
            drho = drho + jnp.sum(drho_occ_k, axis=0)[None]
        else:
            sel = jax.nn.one_hot(sd.kspin, nspin, dtype=drho_occ_k.dtype)
            drho = drho + jnp.einsum("ks,kxyz->sxyz", sel, drho_occ_k)

    if with_detail:
        return drho, dpsi, df, depsF
    return drho


def apply_kernel_split(basis, sd: SplitTermsData, rho0, drho):
    """K drho = d(V_H + V_xc)/drho . drho with split-real device ops."""
    from ..ops.engine_split import xc_energy_split
    from ..kernels.dft_matmul import dft3_real_input, idft3_real_output
    model = basis.model
    terms = basis.terms
    vol = model.unit_cell_volume

    tot = jnp.sum(drho, axis=0)
    dVH = idft3_real_output(sd.hartree_coeffs[..., None]
                            * dft3_real_input(tot, sign=-1))
    dV = jnp.broadcast_to(dVH, drho.shape) \
        * (terms.hartree_scaling or 0.0)
    if terms.xc:
        N = drho.shape[-1] * drho.shape[-2] * drho.shape[-3]
        dvol = vol / N

        def vxc(r):
            if sd.rho_core is not None:
                r = r + sd.rho_core[None] / r.shape[0]
            return jax.grad(lambda rr: xc_energy_split(
                terms.xc, rr, sd.G_cart, vol, terms.xc_scaling))(r) / dvol
        _, dVxc = jax.jvp(vxc, (rho0,), (drho,))
        dV = dV + dVxc
    return dV


def solve_dyson_split(basis, ctx: SplitChi0Context, dV_ext, rho0,
                      tol=1e-6, maxiter=40, sternheimer_tol=1e-6,
                      band_chunk=None, verbose=False):
    """Self-consistent density response on the split (chip) engine.

    Solves (1 - chi0 K) drho = chi0 dV_ext with a host-side GMRES over
    jitted all-real device matvecs.  Returns (drho, dV_tot).
    """
    from .hessian import gmres
    rho0 = jnp.asarray(rho0, dtype=ctx.V.dtype)

    chi0_f = jax.jit(lambda dv: apply_chi0_split_ctx(
        basis, ctx, dv, tol=sternheimer_tol, band_chunk=band_chunk))
    kern_f = jax.jit(lambda dr: apply_kernel_split(basis, ctx.sd, rho0, dr))

    b = chi0_f(jnp.asarray(dV_ext, dtype=ctx.V.dtype))

    def matvec(drho):
        return drho - chi0_f(kern_f(drho))

    drho = gmres(matvec, b, tol=tol, maxiter=maxiter, verbose=verbose)
    return drho, jnp.asarray(dV_ext, dtype=ctx.V.dtype) + kern_f(drho)
