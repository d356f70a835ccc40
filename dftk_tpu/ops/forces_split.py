"""Forces in the split-real (complex-free) engine: chip-runnable AD forces.

The complex-f64 force path (postprocess/forces.py) cannot compile on TPUs
that reject complex dtypes and x64.  This module re-expresses every
position-dependent energy term in split-complex real arithmetic
(trailing [re, im] axis, matmul-DFTs from kernels/dft_matmul.py), so
`jax.grad` of `_force_energy_split` runs on the chip in f32:

  * AtomicLocal   E = Re <rho_G, ff(|G|) sf(pos)> / sqrt(vol)
  * AtomicNonlocal  E = sum w f (P(pos)^dag psi)^dag D (P(pos)^dag psi)
  * NLCC          Exc[rho_v + rho_core(pos)] (split DFT of core density)
  * Ewald         cheap O(atoms^2) host-side f64 term (no orbital data),
                  added outside the chip program.

Reference force formulas: src/postprocess/forces.jl:24,
src/terms/local.jl:147-181, src/terms/nonlocal.jl:49-100,
src/terms/xc.jl:200-297 (NLCC).
"""
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.dft_matmul import dft3, dft3_real_input
from ..models.elements import ElementPsp
from ..utils.special import LM_INDEX, solid_harmonics_real
from .engine_split import xc_energy_split
from .phase import phase_cos_sin


class SplitForceData(NamedTuple):
    """Static per-basis arrays for the split force energy (all real)."""
    Gred_cube: jnp.ndarray      # [M, 3] reduced G of the full fft cube
    ff_loc: tuple               # per atom group: [M] real local form factor
    loc_groups: tuple           # per atom group: atom index tuple
    Gint_pk: jnp.ndarray        # [nk, nG, 3] INTEGER reduced G per k-point
    kred: jnp.ndarray           # [nk, 3] reduced k (fractional part of k+G)
    ff_nl: tuple                # per psp group: [nk, nG, npp, 2]
    D_nl: tuple                 # per psp group: [npp, npp]
    nl_groups: tuple            # per psp group: atom index tuple
    ff_core: tuple              # per NLCC atom-type: [M] core form factor
    core_groups: tuple          # matching atom index tuples


def prepare_force_data(basis, dtype=jnp.float32):
    """Precompute the position-independent form factors (numpy, f64 -> cast).

    Mirrors postprocess/forces.py:_positions_energy's per-group setup but
    emits split-real device arrays.
    """
    model = basis.model
    Gnorm_cube = basis.G_cube_cart_norm.reshape(-1)
    Gred_cube = basis.G_cube.reshape(-1, 3).astype(np.float64)

    ff_loc, loc_groups = [], []
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = np.asarray(el.local_potential_fourier(Gnorm_cube), dtype=float)
        ff_loc.append(jnp.asarray(ff, dtype=dtype))
        loc_groups.append(tuple(int(a) for a in group))

    # nonlocal projector form factors (no structure factor), like
    # postprocess/forces.py:_projector_form_factors
    ff_nl, D_nl, nl_groups = [], [], []
    psp_groups = [g for g in model.atom_groups
                  if isinstance(model.atoms[g[0]], ElementPsp)]
    Gpk = basis.Gpk_cart_np
    Gpk_norm = np.linalg.norm(Gpk, axis=-1)
    for group in psp_groups:
        psp = model.atoms[group[0]].psp
        if psp.n_proj() == 0:
            continue
        Y = solid_harmonics_real(Gpk, psp.lmax)
        npp = psp.n_proj()
        ff = np.zeros(Gpk.shape[:2] + (npp,), dtype=np.complex128)
        D = np.zeros((npp, npp))
        col = 0
        for l in range(psp.lmax + 1):
            nproj_l = psp.n_proj_radial(l)
            if nproj_l == 0:
                continue
            h = np.array(psp.h[l])
            rad = {i: psp.projector_fourier(i, l, Gpk_norm)
                   for i in range(1, nproj_l + 1)}
            for m in range(-l, l + 1):
                ylm = Y[..., LM_INDEX[(l, m)]]
                for i in range(1, nproj_l + 1):
                    ff[:, :, col] = rad[i] * (-1j) ** l * ylm
                    col += 1
                D[col - nproj_l:col, col - nproj_l:col] = h
        ff *= basis.mask_np[:, :, None]
        ff_nl.append(jnp.asarray(
            np.stack([ff.real, ff.imag], axis=-1), dtype=dtype))
        D_nl.append(jnp.asarray(D, dtype=dtype))
        nl_groups.append(tuple(int(a) for a in group))

    ff_core, core_groups = [], []
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not getattr(el, "has_core_density", lambda: False)():
            continue
        ff = np.asarray(el.core_density_fourier(Gnorm_cube), dtype=float)
        ff_core.append(jnp.asarray(ff, dtype=dtype))
        core_groups.append(tuple(int(a) for a in group))

    return SplitForceData(
        Gred_cube=jnp.asarray(Gred_cube, dtype=dtype),
        ff_loc=tuple(ff_loc), loc_groups=tuple(loc_groups),
        Gint_pk=jnp.asarray(basis.Gred_np.astype(np.float64), dtype=dtype),
        kred=jnp.asarray(basis.kcoords_spin, dtype=dtype),
        ff_nl=tuple(ff_nl), D_nl=tuple(D_nl), nl_groups=tuple(nl_groups),
        ff_core=tuple(ff_core), core_groups=tuple(core_groups))


def _phases(Gred, r, extra=None, r_lo=None):
    """(cos, sin) of 2 pi G.r: split e^{+2 pi i G.r}; conj = negate sin.

    Exact f32 range reduction over the integer Gred (ops/phase.py); the
    optional `extra` carries the fractional k.r part of k+G phases."""
    return phase_cos_sin(Gred, r, extra=extra, r_lo=r_lo)


def _force_energy_split(basis, fd: SplitForceData, sd, xy, wocc, rho,
                        pos_hi, pos_lo, xc_terms=None, xc_scaling=1.0,
                        with_local=True):
    """Position-dependent energy, all-real, jnp-differentiable.

    xy: [nk, nb, nG, 2] split orbitals; wocc: [nk, nb] kweight*occupation
    (occupation in the U-row convention of the split SCF); rho fixed.
    Positions ride as an exact (hi, lo) pair (ops/phase.py:split_position)
    so f32 phases suffer neither argument-reduction nor position-
    quantization loss; DIFFERENTIATE W.R.T. pos_lo (d/d pos_lo = d/d r).
    with_local=False skips the AtomicLocal term (computed host-side in f64
    by compute_forces_split: it needs only the density, and the f32 cube
    reduction dominates the on-chip force error otherwise).
    """
    model = basis.model
    vol = model.unit_cell_volume
    sqrt_vol = math.sqrt(vol)
    fft_size = basis.fft_size
    N = int(np.prod(fft_size))
    dt = rho.dtype

    E = jnp.asarray(0.0, dtype=dt)

    # ---- AtomicLocal -------------------------------------------------------
    if with_local:
        rho_tot = jnp.sum(rho, axis=0)
        rho_G = dft3_real_input(rho_tot, sign=-1).reshape(-1, 2) \
            * (sqrt_vol / N)
        for ff, group in zip(fd.ff_loc, fd.loc_groups):
            def loc_one(rh, rl):
                c, s = _phases(fd.Gred_cube, rh, r_lo=rl)  # e^{-2 pi i G.r}
                # Re<rho_G, ff (c, -s)> = sum ff (rho_re c - rho_im s)
                return jnp.sum(ff * (rho_G[:, 0] * c - rho_G[:, 1] * s))
            gidx = jnp.asarray(group)
            E = E + jnp.sum(jax.vmap(loc_one)(
                pos_hi[gidx], pos_lo[gidx])) / sqrt_vol

    # ---- AtomicNonlocal ----------------------------------------------------
    for ff, D, group in zip(fd.ff_nl, fd.D_nl, fd.nl_groups):
        cf_re, cf_im = ff[..., 0], -ff[..., 1]       # conj(ff)
        hi = jax.lax.Precision.HIGHEST   # keep true f32 on the MXU
        def nl_one(rh, rl):
            c, s = _phases(fd.Gint_pk, rh, r_lo=rl,  # conj(sf) = e^{+2 pi i}
                           extra=(fd.kred @ (rh + rl))[:, None])
            A_re = cf_re * c[:, :, None] - cf_im * s[:, :, None]
            A_im = cf_re * s[:, :, None] + cf_im * c[:, :, None]
            Pd_re = (jnp.einsum("kgp,kng->knp", A_re, xy[..., 0],
                                precision=hi)
                     - jnp.einsum("kgp,kng->knp", A_im, xy[..., 1],
                                  precision=hi))
            Pd_im = (jnp.einsum("kgp,kng->knp", A_re, xy[..., 1],
                                precision=hi)
                     + jnp.einsum("kgp,kng->knp", A_im, xy[..., 0],
                                  precision=hi))
            band_e = (jnp.einsum("knp,pq,knq->kn", Pd_re, D, Pd_re,
                                 precision=hi)
                      + jnp.einsum("knp,pq,knq->kn", Pd_im, D, Pd_im,
                                   precision=hi))
            return jnp.sum(wocc * band_e)
        gidx = jnp.asarray(group)
        E = E + jnp.sum(jax.vmap(nl_one)(pos_hi[gidx], pos_lo[gidx])) / vol

    # ---- NLCC: Exc[rho_v + rho_core(pos)] ----------------------------------
    if xc_terms and fd.ff_core:
        rcG = jnp.zeros((fd.Gred_cube.shape[0], 2), dtype=dt)
        for ff, group in zip(fd.ff_core, fd.core_groups):
            def core_one(rh, rl):
                c, s = _phases(fd.Gred_cube, rh, r_lo=rl)
                return jnp.stack([ff * c, -ff * s], axis=-1)
            gidx = jnp.asarray(group)
            rcG = rcG + jnp.sum(
                jax.vmap(core_one)(pos_hi[gidx], pos_lo[gidx]), axis=0)
        rcG = (rcG / sqrt_vol).reshape(
            (fft_size[0], fft_size[1], fft_size[2], 2))
        rho_core = dft3(rcG, sign=+1)[..., 0] / math.sqrt(vol)
        rho_core = jnp.maximum(rho_core, 0.0)
        rho_xc = rho + rho_core[None] / rho.shape[0]
        E = E + xc_energy_split(xc_terms, rho_xc, sd.G_cart, vol, xc_scaling)

    return E


def compute_forces_split(basis, sd, U, occupation, rho, dtype=None):
    """Forces (reduced coords, numpy f64) from split-SCF results.

    The chip program differentiates the orbital/density terms; the Ewald
    (and classical pairwise) contribution is added host-side in f64 -- it
    involves no device data and needs f64 lattice sums.
    """
    model = basis.model
    terms = basis.terms
    fd = prepare_force_data(basis, dtype=dtype or rho.dtype)
    nG = sd.kin.shape[1]
    xy = jnp.stack([U[..., :nG], U[..., nG:]], axis=-1)
    wocc = sd.kweights[:, None] * jnp.asarray(occupation, dtype=rho.dtype)
    from .phase import split_position
    ph, pl = split_position(np.stack(model.positions))
    pos_hi = jnp.asarray(ph, dtype=rho.dtype)
    pos_lo = jnp.asarray(pl, dtype=rho.dtype)

    # arrays ride as jit ARGUMENTS (closed-over device arrays become HLO
    # constants, which remote compile services reject for big systems);
    # d/d pos_lo = d/d positions (pos_hi is the constant grid part)
    def energy(fd_, sd_, xy_, wocc_, rho_, ph_, pl_):
        return _force_energy_split(basis, fd_, sd_, xy_, wocc_, rho_,
                                   ph_, pl_, xc_terms=terms.xc,
                                   xc_scaling=terms.xc_scaling,
                                   with_local=False)
    grad_fn = jax.jit(jax.grad(energy, argnums=6))
    F = -np.asarray(jax.device_get(grad_fn(fd, sd, xy, wocc, rho,
                                           pos_hi, pos_lo)),
                    dtype=np.float64)

    # host-side f64 terms (need only the density / no device data):
    # AtomicLocal + Ewald (+ classical pairwise)
    rho_np = np.asarray(jax.device_get(rho), dtype=np.float64)
    F = F - _local_position_gradient_np(basis, rho_np)
    from ..ops.ewald import ewald_position_gradient_np
    charges = np.array([at.charge_ionic() for at in model.atoms], dtype=float)
    if len(charges) > 0 and terms.E_ewald != 0.0:
        F = F - ewald_position_gradient_np(model.lattice, charges,
                                           np.stack(model.positions))
    if terms.pairwise_forces is not None:
        F = F + terms.pairwise_forces
    return F


def _local_position_gradient_np(basis, rho):
    """dE_AtomicLocal/dpositions (reduced) in numpy f64.

    E = Re<rho_G, ff(|G|) e^{-2 pi i G.r}>/sqrt(vol);
    dE/dr_i = (2 pi/sqrt(vol)) sum_G ff G Im[conj(rho_G) e^{-2 pi i G.r_i}].
    """
    model = basis.model
    vol = model.unit_cell_volume
    N = int(np.prod(basis.fft_size))
    rho_G = np.fft.fftn(np.sum(rho, axis=0)) * (math.sqrt(vol) / N)
    rho_G = rho_G.reshape(-1)
    Gnorm = basis.G_cube_cart_norm.reshape(-1)
    Gred = basis.G_cube.reshape(-1, 3).astype(np.float64)
    grad = np.zeros((len(model.atoms), 3))
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = np.asarray(el.local_potential_fourier(Gnorm), dtype=float)
        for i in group:
            phase = np.exp(-2j * math.pi * (Gred @ model.positions[i]))
            w = ff * (np.conj(rho_G) * phase).imag
            grad[i] = (2 * math.pi / math.sqrt(vol)) * (w @ Gred)
    return grad
