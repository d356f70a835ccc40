"""Stresses: sigma = (1/Omega) dE/d(strain) at fixed orbital coefficients.

The reference pushes ForwardDiff dual numbers through the whole basis
construction (DFTK `src/postprocess/stresses.jl` + workarounds/
forwarddiff_rules.jl).  Here the total energy is re-expressed as ONE pure
jnp function of the lattice matrix - every lattice-dependent quantity
(reciprocal lattice, volume, |k+G|^2, form factors, Poisson kernel, Ewald
sums, FFT normalisations) is recomputed inside the traced graph from the
fixed integer G-vectors and orbital coefficients - and jax.grad w.r.t. a
symmetric strain gives the stress tensor exactly.
"""
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.elements import ElementPsp
from ..ops.ewald import default_eta, energy_ewald, ewald_sum_bounds
from ..ops.hamiltonian import xc_energy
from ..ops.occupation import entropy_energy
from ..utils.special import LM_INDEX, solid_harmonics_real
from .forces import _projector_form_factors  # cached per (basis, psp)


def energy_at_lattice(basis, psi, occupation, lattice, positions=None):
    """Total energy as a differentiable function of the lattice matrix.

    psi / occupation are held fixed (Hellmann-Feynman); the density is
    re-derived from psi inside the graph so its implicit lattice dependence
    (FFT normalisation) is captured.
    """
    model = basis.model
    terms = basis.terms
    bd = basis.data
    fft_size = basis.fft_size
    N = int(np.prod(fft_size))
    if positions is None:
        positions = jnp.asarray(np.stack(model.positions))

    B = 2 * jnp.pi * jnp.linalg.inv(lattice.T)
    vol = jnp.abs(jnp.linalg.det(lattice))
    sqrt_vol = jnp.sqrt(vol)
    dvol = vol / N

    # --- kinetic (+ its lattice dependence through |B (k+G)|^2) -------------
    Gred_pk = jnp.asarray(basis.Gred_np.astype(np.float64)
                          + basis.kcoords_spin[:, None, :])       # [nk,nG,3]
    Gpk_cart = jnp.einsum("ab,knb->kna", B, Gred_pk)
    kin = 0.5 * jnp.sum(Gpk_cart * Gpk_cart, axis=-1) * bd.mask
    wocc = bd.kweights[:, None] * occupation
    abs2 = (psi.conj() * psi).real
    E_kin = jnp.sum(wocc[:, :, None] * kin[:, None, :] * abs2) \
        * terms.data.kinetic_scale

    # --- density from psi (normalisation carries the volume) ----------------
    from ..ops import fft as fftops
    cube = jax.vmap(lambda c, idx, m: fftops.scatter_to_cube(c, idx, m, fft_size)
                    )(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1)) * (N / sqrt_vol)
    dens_k = jnp.einsum("kn,knxyz->kxyz", wocc, (psir.conj() * psir).real)
    nspin = model.n_spin_components
    if nspin == 1:
        rho = jnp.sum(dens_k, axis=0)[None]
    else:
        sel = jax.nn.one_hot(bd.kspin, nspin, dtype=dens_k.dtype)
        rho = jnp.einsum("ks,kxyz->sxyz", sel, dens_k)
    from ..ops.density import make_symmetrizer
    symmetrizer = make_symmetrizer(basis)
    if symmetrizer is not None:
        # the gather maps are lattice-independent; symmetrizing inside the
        # graph keeps the density consistent with the SCF one
        rho = symmetrizer(rho)
    rho_tot = jnp.sum(rho, axis=0)
    rho_G = jnp.fft.fftn(rho_tot) * (sqrt_vol / N)                # fft_cube

    # --- Cartesian G data on the cube ----------------------------------------
    Gred_cube = jnp.asarray(basis.G_cube.astype(np.float64))      # [n1,n2,n3,3]
    G_cart = jnp.einsum("ab,xyzb->xyza", B, Gred_cube)
    Gsq = jnp.sum(G_cart * G_cart, axis=-1)

    # --- Hartree --------------------------------------------------------------
    E_H = jnp.asarray(0.0)
    if terms.hartree_scaling:
        coeffs = jnp.where(Gsq > 0, 4 * jnp.pi / jnp.where(Gsq > 0, Gsq, 1.0), 0.0)
        E_H = 0.5 * terms.hartree_scaling * jnp.sum(
            coeffs * (rho_G.conj() * rho_G).real)

    # --- XC (with the NLCC core density rebuilt from the traced lattice) ----
    def _traced_core(fourier_sq_attr, has_attr):
        """NLCC core (kinetic) density as a function of the traced lattice:
        form factors re-evaluated at the traced |G|^2 via the *_sq psp
        evaluators (jnp Hankel transforms)."""
        Gsq_f = jnp.sum(G_cart * G_cart, axis=-1).reshape(-1)
        core_G = jnp.zeros(Gsq_f.shape, dtype=jnp.complex128)
        ffc = {}
        Gred_f = jnp.asarray(basis.G_cube.reshape(-1, 3).astype(np.float64))
        for i, at in enumerate(model.atoms):
            if not getattr(at, has_attr, lambda: False)():
                continue
            if at not in ffc:
                ffc[at] = getattr(at.psp, fourier_sq_attr)(Gsq_f)
            phase = jnp.exp(-2j * jnp.pi * (Gred_f @ positions[i]))
            core_G = core_G + ffc[at] * phase
        core = jnp.fft.ifftn(
            (core_G / sqrt_vol).reshape(fft_size)).real * (N / sqrt_vol)
        return jnp.maximum(core, 0.0)

    E_xc = jnp.asarray(0.0)
    if terms.xc:
        rho_xc = rho
        if terms.rho_core_np is not None:
            rho_core = _traced_core("core_density_fourier_sq",
                                    "has_core_density")
            rho_xc = rho + rho_core[None] / rho.shape[0]
        tau_xc = None
        if any(f.family == "mgga" for f, _ in terms.xc):
            # meta-GGA: recompute tau from psi inside the lattice trace so
            # the |B(k+G)|^2 and FFT-normalisation dependences are captured
            # (reference pushes ForwardDiff through compute_kinetic_energy_
            # density the same way, src/postprocess/stresses.jl)
            tau_k = 0.0
            for a in range(3):
                dpsi = jax.vmap(
                    lambda c, idx, m: fftops.scatter_to_cube(c, idx, m,
                                                             fft_size)
                )(1j * Gpk_cart[:, None, :, a] * psi, bd.Gidx, bd.mask)
                dpsir = jnp.fft.ifftn(dpsi, axes=(-3, -2, -1)) * (N / sqrt_vol)
                tau_k = tau_k + jnp.einsum(
                    "kn,knxyz->kxyz", wocc, (dpsir.conj() * dpsir).real)
            tau_k = 0.5 * tau_k
            if nspin == 1:
                tau_xc = jnp.sum(tau_k, axis=0)[None]
            else:
                tau_xc = jnp.einsum("ks,kxyz->sxyz",
                                    jax.nn.one_hot(bd.kspin, nspin,
                                                   dtype=tau_k.dtype), tau_k)
            if symmetrizer is not None:
                tau_xc = symmetrizer(tau_xc)
            if terms.tau_core_np is not None:
                tau_core = _traced_core("core_tau_fourier_sq", "has_core_tau")
                tau_xc = tau_xc + tau_core[None] / rho.shape[0]
        E_xc = xc_energy(terms.xc, rho_xc, G_cart, vol, terms.xc_scaling,
                         tau=tau_xc)

    # --- AtomicLocal (p^2-form factors keep the graph smooth at G=0) --------
    Gsq_flat = Gsq.reshape(-1)
    Gred_flat = Gred_cube.reshape(-1, 3)
    E_loc = jnp.asarray(0.0)
    vloc_G = jnp.zeros(Gsq_flat.shape[0], dtype=jnp.complex128)
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = el.local_potential_fourier_sq(Gsq_flat)   # jnp, traced through B
        sf = jnp.sum(jnp.exp(-2j * jnp.pi * (Gred_flat @ positions[group, :].T)),
                     axis=1)
        vloc_G = vloc_G + ff * sf / sqrt_vol
    E_loc = jnp.real(jnp.vdot(rho_G.reshape(-1), vloc_G))

    # --- AtomicNonlocal ---------------------------------------------------------
    E_nl = jnp.asarray(0.0)
    if terms.has_nonlocal:
        Gpk_sq = jnp.sum(Gpk_cart * Gpk_cart, -1)
        Y = solid_harmonics_real(Gpk_cart, _max_l(model))
        psp_groups = [g for g in model.atom_groups
                      if isinstance(model.atoms[g[0]], ElementPsp)]
        for group in psp_groups:
            psp = model.atoms[group[0]].psp
            cols = []
            D = np.zeros((psp.n_proj(), psp.n_proj()))
            col = 0
            for l in range(psp.lmax + 1):
                nproj_l = psp.n_proj_radial(l)
                if nproj_l == 0:
                    continue
                h = np.array(psp.h[l])
                rad = {i: psp.projector_fourier_sq(i, l, Gpk_sq)
                       for i in range(1, nproj_l + 1)}
                for m in range(-l, l + 1):
                    ylm = Y[..., LM_INDEX[(l, m)]]
                    for i in range(1, nproj_l + 1):
                        cols.append(rad[i] * (-1j) ** l * ylm)
                        col += 1
                    D[col - nproj_l:col, col - nproj_l:col] = h
            ff = jnp.stack(cols, axis=-1) * bd.mask[:, :, None]
            Dj = jnp.asarray(D)
            for atom_idx in group:
                sf = jnp.exp(-2j * jnp.pi * (Gred_pk @ positions[atom_idx]))
                P = ff * sf[:, :, None] / sqrt_vol
                Pd = jnp.einsum("kgp,kng->knp", P.conj(), psi)
                band_e = jnp.einsum("knp,pq,knq->kn", Pd.conj(),
                                    Dj.astype(Pd.dtype), Pd).real
                E_nl = E_nl + jnp.sum(wocc * band_e)

    # --- Ewald / PspCorrection ---------------------------------------------------
    E_ew = jnp.asarray(0.0)
    charges = np.array([at.charge_ionic() for at in model.atoms], dtype=float)
    if len(charges) > 0 and terms.E_ewald != 0.0:
        eta = default_eta(model.lattice)
        Gbox, Rbox = ewald_sum_bounds(model.lattice, np.stack(model.positions),
                                      eta)
        E_ew = energy_ewald(lattice, charges, positions, eta=eta,
                            Gbox=Gbox, Rbox=Rbox)
    E_psp = jnp.asarray(0.0)
    if terms.E_psp_correction != 0.0:
        corr = sum(len(g) * model.atoms[g[0]].psp.energy_correction()
                   for g in model.atom_groups
                   if isinstance(model.atoms[g[0]], ElementPsp))
        E_psp = corr * model.n_electrons / vol

    return E_kin + E_H + E_xc + E_loc + E_nl + E_ew + E_psp


def _max_l(model):
    return max((at.psp.lmax for g in model.atom_groups
                for at in [model.atoms[g[0]]] if isinstance(at, ElementPsp)),
               default=0)


def compute_stresses_cart(scfres, basis=None):
    """Cartesian stress tensor (3x3, Ha/bohr^3), symmetrized.

    sigma = (1/Omega) dE[(I + eps) L] / d eps  at eps = 0.
    """
    basis = basis or scfres.basis
    if any(f.potential is not None for f, _ in basis.terms.xc):
        raise NotImplementedError(
            "stresses are undefined for potential-only functionals "
            "(TB09/mBJ has no energy functional to differentiate)")
    model = basis.model
    L0 = jnp.asarray(model.lattice)
    vol = model.unit_cell_volume

    def f(eps):
        eps_sym = (eps + eps.T) / 2
        L = (jnp.eye(3) + eps_sym) @ L0
        return energy_at_lattice(basis, scfres.psi, scfres.occupation, L)

    grad = jax.grad(f)(jnp.zeros((3, 3)))
    stress = np.asarray(jax.device_get(grad)) / vol
    stress = (stress + stress.T) / 2
    return symmetrize_stresses(basis, stress)


def symmetrize_stresses(basis, stress):
    """Average the Cartesian stress over the crystal symmetries."""
    model = basis.model
    out = np.zeros_like(stress)
    for op in basis.symmetries:
        Wcart = model.lattice @ op.Wmat @ np.linalg.inv(model.lattice)
        out += Wcart @ stress @ np.linalg.inv(Wcart)
    return out / len(basis.symmetries)
