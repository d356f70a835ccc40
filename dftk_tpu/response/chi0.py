"""Density-density response: apply chi_0 via Sternheimer equations.

Mirrors DFTK `src/response/chi0.jl`:
  * sternheimer_solver (chi0.jl:115-283): for every occupied band solve the
    projected linear system
        P_c (H_k - eps_n) P_c  delta_psi_n = - P_c (delta_V psi_n)
    with P_c = 1 - sum_occ |psi><psi| and a Teter preconditioner; here the
    solve is a *batched* preconditioned CG over all (k, band) pairs at once
    (fixed-shape lax.while_loop) instead of a per-band loop.
  * apply_chi0 (chi0.jl:440-555): delta_rho from delta_V, including the
    metallic occupation-response terms
        delta_f_n = filled * f'((eps_n - epsF)/T)/T * (<psi|dV|psi> - d epsF)
    and the Fermi-level shift keeping electron count fixed.

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


def _project_out_occupied(x, psi_occ):
    """x - sum_n |psi_n><psi_n | x_m>  over the band axis of psi_occ."""
    ov = jnp.einsum("kng,kmg->knm", psi_occ.conj(), x)
    return x - jnp.einsum("knm,kng->kmg", ov, psi_occ)


def sternheimer_solver(apply_H, psi_occ, eps_occ, rhs, kin, mask,
                       tol=1e-9, maxiter=200):
    """Solve P_c (H - eps_n) P_c dpsi_n = -P_c rhs_n for all (k, n) at once.

    psi_occ [nk, no, nG]; eps_occ [nk, no]; rhs [nk, no, nG].
    Returns dpsi [nk, no, nG] orthogonal to the occupied space.
    """
    mask3 = mask[:, None, :]

    def Pc(x):
        return _project_out_occupied(x, psi_occ) * mask3

    b = -Pc(rhs)

    def A(x):
        hx = apply_H(x) - eps_occ[:, :, None].astype(x.dtype) * x
        return Pc(hx)

    # TPA-style preconditioner shifted per band
    mean_kin = jnp.maximum(
        jnp.einsum("kng,kg,kng->kn", psi_occ.conj(), kin, psi_occ).real, 1e-12)

    def M(x):
        return x * (mean_kin[:, :, None]
                    / (mean_kin[:, :, None] + kin[:, None, :] + 1e-20))

    x = jnp.zeros_like(b)
    r = b
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
        resmax = jnp.max(jnp.linalg.norm(r, axis=-1))
        return jnp.logical_and(it < maxiter, resmax > tol)

    state = jax.lax.while_loop(cond, body, (x, r, z, p, rz, jnp.asarray(0)))
    return Pc(state[0])


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
               occupation_threshold=1e-8):
    """delta_rho = chi_0 delta_V  (adiabatic density response).

    delta_V [nspin, n1,n2,n3] real; returns delta_rho of the same shape.
    Includes metallic occupation/Fermi-level response when T > 0.
    """
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

    # delta_V * psi in the plane-wave basis
    dV_k = delta_V[bd.kspin]                           # [nk, grid]
    from ..ops import fft as fftops
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
    dVpsir = dV_k[:, None] * psir
    dVpsi = jax.vmap(fftops.gather_from_cube)(
        jnp.fft.fftn(dVpsir, axes=(-3, -2, -1)), bd.Gidx, bd.mask)

    # ---- wavefunction (Sternheimer) response of occupied bands ---------------
    # Project out only the OCCUPIED space: (f_n - f_m) vanishes for pairs of
    # filled bands, so their mutual response cancels exactly (insulators);
    # the extra computed unoccupied bands must remain reachable by the solve.
    occ_mask = occ > occupation_threshold
    occ_w = jnp.where(occ_mask, occ, 0.0)
    psi_occ = psi * occ_mask[:, :, None]
    rhs = dVpsi * occ_mask[:, :, None]
    dpsi = sternheimer_solver(apply, psi_occ, eps, rhs, ctx.ham.kin, bd.mask,
                              tol=tol)
    dpsi = dpsi * occ_mask[:, :, None]

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

    return drho
