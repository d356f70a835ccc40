"""Forces: -dE/dR at fixed orbitals/occupations (Hellmann-Feynman).

The reference hand-derives per-term force formulas (DFTK
`src/postprocess/forces.jl`, `terms/local.jl:147-181`,
`terms/nonlocal.jl:49-100`).  TPU-native redesign: the position-dependent
energy terms (AtomicLocal, AtomicNonlocal, Ewald) are expressed as one
differentiable jnp function of the fractional positions and jax.grad does
the rest - exact derivatives, no per-term formula maintenance, and the same
code path later provides phonon second derivatives.

Returned forces are in *reduced* coordinates by default (covectors);
`compute_forces_cart` converts with inv(lattice)^T and symmetrizes.
"""
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.elements import ElementPsp
from ..ops.ewald import default_eta, energy_ewald, ewald_sum_bounds
from ..utils.special import LM_INDEX, solid_harmonics_real


def _positions_energy(basis, psi, occupation, rho, positions, tau=None):
    """All explicitly position-dependent energy terms, jnp-differentiable.

    positions: [n_atoms, 3] fractional (traced); tau only needed for
    meta-GGA models with NLCC psps.
    """
    model = basis.model
    terms = basis.terms
    vol = model.unit_cell_volume
    sqrt_vol = math.sqrt(vol)
    E = jnp.asarray(0.0)

    # ---- AtomicLocal: E = sum_G conj(rho_G) Vloc_G ---------------------------
    rho_tot = jnp.sum(rho, axis=0)
    rho_G = jnp.fft.fftn(rho_tot) * (sqrt_vol / np.prod(basis.fft_size))
    Gred = jnp.asarray(basis.G_cube.reshape(-1, 3).astype(np.float64))
    Gnorm = jnp.asarray(basis.G_cube_cart_norm.reshape(-1))
    vloc_G = jnp.zeros(Gred.shape[0], dtype=jnp.complex128)
    for ig, group in enumerate(model.atom_groups):
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = jnp.asarray(np.asarray(el.local_potential_fourier(
            np.asarray(Gnorm))))     # position-independent, precompute in np
        sf = jnp.sum(jnp.exp(-2j * jnp.pi * (Gred @ positions[group, :].T)),
                     axis=1)
        vloc_G = vloc_G + ff * sf / sqrt_vol
    # E_local = sum_G conj(rho_G) vloc_G  (real by construction)
    E = E + jnp.real(jnp.vdot(rho_G.reshape(-1), vloc_G)) * 1.0

    # ---- AtomicNonlocal ------------------------------------------------------
    if terms.has_nonlocal:
        E = E + _nonlocal_energy(basis, psi, occupation, positions)

    # ---- Ewald ----------------------------------------------------------------
    charges = np.array([at.charge_ionic() for at in model.atoms], dtype=float)
    if len(charges) > 0 and terms.E_ewald != 0.0:
        eta = default_eta(model.lattice)
        Gbox, Rbox = ewald_sum_bounds(model.lattice,
                                      np.stack(model.positions), eta)
        E = E + energy_ewald(model.lattice, charges, positions, eta=eta,
                             Gbox=Gbox, Rbox=Rbox)

    # ---- NLCC: Exc[rho_v + rho_core(positions)] ------------------------------
    # The core density moves with the atoms, so Exc contributes a force for
    # psps with nonlinear core correction (reference src/terms/xc.jl:200-297).
    if terms.xc and (terms.rho_core_np is not None
                     or terms.tau_core_np is not None):
        from ..ops.hamiltonian import xc_energy
        nspin = rho.shape[0]
        rho_xc = rho
        if terms.rho_core_np is not None:
            rho_core = _core_density_of_positions(basis, positions)
            rho_xc = rho + rho_core[None] / nspin
        tau_xc = tau
        if tau is not None and terms.tau_core_np is not None:
            # mGGA NLCC: tau_core moves with the atoms too, contributing
            # the Vtau force term (reference src/terms/xc.jl:233-241)
            tau_core = _core_density_of_positions(basis, positions,
                                                  kind="tau")
            tau_xc = tau + tau_core[None] / nspin
        E = E + xc_energy(terms.xc, rho_xc,
                          jnp.asarray(basis.G_cube_cart), vol,
                          terms.xc_scaling, tau=tau_xc)
    return E


def _core_density_of_positions(basis, positions, kind="rho"):
    """NLCC core (kinetic-energy) density on the real grid as a jnp function
    of positions.

    Traced counterpart of ops/terms.py:_atomic_superposition (which is
    static numpy): core form factors are precomputed per element, only the
    structure factors depend on the traced positions.  kind="rho" gives the
    core charge density, kind="tau" the core kinetic-energy density (mGGA).
    """
    has_attr = "has_core_density" if kind == "rho" else "has_core_tau"
    fourier_attr = ("core_density_fourier" if kind == "rho"
                    else "core_tau_fourier")
    model = basis.model
    vol = model.unit_cell_volume
    Gnorm = basis.G_cube_cart_norm.reshape(-1)
    Gred = jnp.asarray(basis.G_cube.reshape(-1, 3).astype(np.float64))
    rho_G = jnp.zeros(Gnorm.shape[0], dtype=jnp.complex128)
    ff_cache = {}
    for i, at in enumerate(model.atoms):
        if not getattr(at, has_attr, lambda: False)():
            continue
        if at not in ff_cache:
            ff_cache[at] = jnp.asarray(np.asarray(
                getattr(at, fourier_attr)(Gnorm)))
        phase = jnp.exp(-2j * jnp.pi * (Gred @ positions[i]))
        rho_G = rho_G + ff_cache[at] * phase
    rho_G = rho_G / math.sqrt(vol)
    N = np.prod(basis.fft_size)
    rho = jnp.fft.ifftn(rho_G.reshape(basis.fft_size)).real \
        * (N / math.sqrt(vol))
    return jnp.maximum(rho, 0.0)


def _nonlocal_energy(basis, psi, occupation, positions):
    """E_nl = sum_kn w_k f_kn  (P^dag psi)^dag D (P^dag psi), P built from
    traced positions (structure factors) x precomputed form factors."""
    model = basis.model
    sqrt_vol = math.sqrt(model.unit_cell_volume)
    bd = basis.data

    psp_groups = [g for g in model.atom_groups
                  if isinstance(model.atoms[g[0]], ElementPsp)]
    E = jnp.asarray(0.0)
    Gred_pk = jnp.asarray(basis.Gred_np.astype(np.float64)
                          + basis.kcoords_spin[:, None, :])   # [nk, nG, 3]
    wocc = bd.kweights[:, None] * occupation

    for group in psp_groups:
        el = model.atoms[group[0]]
        psp = el.psp
        ff, D1 = _projector_form_factors(basis, psp)   # [nk, nG, npp], [npp, npp]
        for atom_idx in group:
            r = positions[atom_idx]
            sf = jnp.exp(-2j * jnp.pi * (Gred_pk @ r))   # [nk, nG]
            P = ff * sf[:, :, None] / sqrt_vol
            Pd = jnp.einsum("kgp,kng->knp", P.conj(), psi)
            band_e = jnp.einsum("knp,pq,knq->kn", Pd.conj(),
                                D1.astype(Pd.dtype), Pd).real
            E = E + jnp.sum(wocc * band_e)
    return E


def _projector_form_factors(basis, psp):
    """Per-atom-type projector form factors (no structure factor), cached.

    The cache lives on the basis instance (not a module-level dict keyed on
    id(basis): ids are reused after garbage collection, which silently
    returned stale form factors of a dead basis with a different k-count).
    """
    cache = getattr(basis, "_ff_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(basis, "_ff_cache", cache)
    key = psp.identifier
    if key in cache:
        return cache[key]
    Gpk = basis.Gpk_cart_np
    Gpk_norm = np.linalg.norm(Gpk, axis=-1)
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
    out = (jnp.asarray(ff), jnp.asarray(D))
    cache[key] = out
    return out


def compute_forces(scfres, basis=None):
    """Forces in reduced coordinates, [n_atoms, 3] (numpy)."""
    basis = basis or scfres.basis
    if any(f.potential is not None for f, _ in basis.terms.xc):
        raise NotImplementedError(
            "forces are undefined for potential-only functionals (TB09/mBJ "
            "has no energy functional to differentiate)")
    positions = jnp.asarray(np.stack(basis.model.positions))
    tau = getattr(scfres, "tau", None)
    grad = jax.grad(
        lambda pos: _positions_energy(basis, scfres.psi, scfres.occupation,
                                      scfres.rho, pos, tau=tau))(positions)
    F = -np.asarray(jax.device_get(grad))
    if basis.terms.pairwise_forces is not None:
        F = F + basis.terms.pairwise_forces
    return F


def compute_forces_cart(scfres, basis=None):
    """Symmetrized Cartesian forces [n_atoms, 3] (numpy)."""
    basis = basis or scfres.basis
    model = basis.model
    f_red = compute_forces(scfres, basis)
    f_red = symmetrize_forces(basis, f_red)
    return f_red @ np.linalg.inv(model.lattice)   # rows: inv(L)^T f


def symmetrize_forces(basis, forces_red):
    """Average forces over the basis symmetries (DFTK symmetry.jl:392-421)."""
    model = basis.model
    syms = basis.symmetries
    positions = model.positions
    out = np.zeros_like(forces_red)
    tol = 1e-5
    for group in model.atom_groups:
        pos_g = np.stack([positions[i] for i in group])
        for op in syms:
            W, w = op.Wmat, op.wvec
            invWt = np.linalg.inv(W.T)
            for local_idx, idx in enumerate(group):
                # preimage: atom j in group with W pos_j + w == pos_idx (mod 1)
                target = np.linalg.solve(W, positions[idx] - w)
                d = pos_g - target
                d -= np.round(d)
                j_local = int(np.argmin(np.abs(d).max(axis=1)))
                assert np.abs(d[j_local]).max() < 10 * tol
                out[idx] += invWt @ forces_red[group[j_local]]
    return out / len(syms)
