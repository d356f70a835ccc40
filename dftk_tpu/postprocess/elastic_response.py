"""Elastic tensor via DFPT response (implicit SCF differentiation).

Replaces the central-difference loop over re-converged SCFs
(postprocess/elastic.py) with the implicit-function-theorem route the
reference uses (src/postprocess/elastic.jl:34 + src/response/hessian.jl):

    C_ab = (1/Omega) [ d^2F/de_a de_b |_psi  (clamped orbitals)
                       + 2 sum w f Re < d_a(H psi), dpsi^(b) > ]
    (Omega + K) dpsi^(b) = - P_c d_b(H psi)

where F(eps, psi) = energy_at_lattice(psi fixed, L = (1+eps)L0) carries
every explicit strain dependence (reciprocal metric, Poisson kernel, form
factors, FFT normalizations), d_a(H psi) is one jax.jvp of the
lattice-traced Hamiltonian apply, and (Omega + K) is the SCF Hessian from
scf/newton.py.  Insulators at T = 0.  Cost: 6 jvps + 6 CG solves instead
of 12 re-converged SCFs.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.elements import ElementPsp
from ..ops import fft as fftops
from ..ops import hamiltonian as hamops
from ..ops.density import compute_density
from ..utils.special import LM_INDEX, solid_harmonics_real
from .stresses import energy_at_lattice


_VOIGT = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]


def _strain_mat(a):
    """Unit engineering-strain direction (off-diagonals carry 1/2 so the
    Voigt convention matches postprocess/elastic.py exactly)."""
    i, j = _VOIGT[a]
    E = np.zeros((3, 3))
    if i == j:
        E[i, j] = 1.0
    else:
        E[i, j] = E[j, i] = 0.5
    return jnp.asarray(E)


def _strained_H_psi(basis, psi, occupation, eps, x):
    """H(eps) x with the potential built from rho(psi fixed, eps).

    eps: symmetric strain matrix (traced); x [nk, nb, nG].  Mirrors the
    lattice-traced pieces of postprocess/stresses.py as an OPERATOR.
    """
    model = basis.model
    terms = basis.terms
    bd = basis.data
    fft_size = basis.fft_size
    N = int(np.prod(fft_size))

    L0 = jnp.asarray(np.asarray(model.lattice, dtype=float))
    lattice = (jnp.eye(3) + (eps + eps.T) / 2) @ L0
    B = 2 * jnp.pi * jnp.linalg.inv(lattice.T)
    vol = jnp.abs(jnp.linalg.det(lattice))
    sqrt_vol = jnp.sqrt(vol)

    Gred_pk = jnp.asarray(basis.Gred_np.astype(np.float64)
                          + basis.kcoords_spin[:, None, :])
    Gpk_cart = jnp.einsum("ab,knb->kna", B, Gred_pk)
    kin = 0.5 * jnp.sum(Gpk_cart * Gpk_cart, axis=-1) * bd.mask \
        * terms.data.kinetic_scale

    # density from fixed psi (volume normalization traced)
    cube0 = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                     )(psi, bd.Gidx, bd.mask)
    psir0 = jnp.fft.ifftn(cube0, axes=(-3, -2, -1)) * (N / sqrt_vol)
    wocc = bd.kweights[:, None] * occupation
    dens_k = jnp.einsum("kn,knxyz->kxyz", wocc, (psir0.conj() * psir0).real)
    nspin = model.n_spin_components
    if nspin == 1:
        rho = jnp.sum(dens_k, axis=0)[None]
    else:
        sel = jax.nn.one_hot(bd.kspin, nspin, dtype=dens_k.dtype)
        rho = jnp.einsum("ks,kxyz->sxyz", sel, dens_k)
    from ..ops.density import make_symmetrizer
    symm = make_symmetrizer(basis)
    if symm is not None:
        rho = symm(rho)
    rho_tot = jnp.sum(rho, axis=0)

    Gred_cube = jnp.asarray(basis.G_cube.astype(np.float64))
    G_cart = jnp.einsum("ab,xyzb->xyza", B, Gred_cube)
    Gsq = jnp.sum(G_cart * G_cart, axis=-1)

    # local potential grids: V_loc + V_H + V_xc (all traced through eps)
    Gsq_flat = Gsq.reshape(-1)
    Gred_flat = Gred_cube.reshape(-1, 3)
    vloc_G = jnp.zeros(Gsq_flat.shape[0], dtype=jnp.complex128)
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = el.local_potential_fourier_sq(Gsq_flat)
        sf = jnp.sum(jnp.exp(-2j * jnp.pi
                             * (Gred_flat @ jnp.asarray(np.stack(
                                 model.positions))[jnp.asarray(group)].T)),
                     axis=1)
        vloc_G = vloc_G + ff * sf / sqrt_vol
    Vloc = jnp.fft.ifftn(vloc_G.reshape(fft_size)).real * (N / sqrt_vol)

    rho_G = jnp.fft.fftn(rho_tot)
    coeffs = jnp.where(Gsq > 0, 4 * jnp.pi / jnp.where(Gsq > 0, Gsq, 1.0),
                       0.0) * (terms.hartree_scaling or 0.0)
    VH = jnp.fft.ifftn(coeffs * rho_G).real

    V = jnp.broadcast_to(Vloc + VH, (nspin,) + tuple(fft_size))
    if terms.xc:
        rho_xc = rho
        if terms.rho_core_np is not None:
            Gsq_f = Gsq.reshape(-1)
            rcG = jnp.zeros(Gsq_f.shape, dtype=jnp.complex128)
            done = {}
            for i, at in enumerate(model.atoms):
                if not getattr(at, "has_core_density", lambda: False)():
                    continue
                if at not in done:
                    done[at] = at.psp.core_density_fourier_sq(Gsq_f)
                th = 2 * jnp.pi * (Gred_flat @ jnp.asarray(
                    model.positions[i]))
                rcG = rcG + done[at] * jnp.exp(-1j * th)
            rho_core = jnp.fft.ifftn(
                (rcG / sqrt_vol).reshape(fft_size)).real * (N / sqrt_vol)
            rho_xc = rho + jnp.maximum(rho_core, 0.0)[None] / nspin
        dvol = vol / N
        Vxc = jax.grad(lambda r: hamops.xc_energy(
            terms.xc, r, G_cart, vol, terms.xc_scaling))(rho_xc) / dvol
        V = V + Vxc

    # ---- apply to x ---------------------------------------------------------
    out = kin[:, None, :] * x
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(x, bd.Gidx, bd.mask)
    xr = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
    Vx = V[bd.kspin][:, None] * xr
    out = out + jax.vmap(fftops.gather_from_cube)(
        jnp.fft.fftn(Vx, axes=(-3, -2, -1)), bd.Gidx, bd.mask)

    # nonlocal (projectors traced through the metric)
    if terms.has_nonlocal:
        Gpk_sq = jnp.sum(Gpk_cart * Gpk_cart, -1)
        lmax = max((at.psp.lmax for g in model.atom_groups
                    for at in [model.atoms[g[0]]]
                    if isinstance(at, ElementPsp)), default=0)
        Y = solid_harmonics_real(Gpk_cart, lmax)
        for group in model.atom_groups:
            el = model.atoms[group[0]]
            if not (isinstance(el, ElementPsp) and el.psp.n_proj() > 0):
                continue
            psp = el.psp
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
                for mq in range(-l, l + 1):
                    ylm = Y[..., LM_INDEX[(l, mq)]]
                    for i in range(1, nproj_l + 1):
                        cols.append(rad[i] * (-1j) ** l * ylm)
                        col += 1
                    D[col - nproj_l:col, col - nproj_l:col] = h
            ffm = jnp.stack(cols, axis=-1) * bd.mask[:, :, None]
            Dj = jnp.asarray(D)
            for atom_idx in group:
                sf = jnp.exp(-2j * jnp.pi * (Gred_pk @ jnp.asarray(
                    model.positions[atom_idx])))
                P = ffm * sf[:, :, None] / sqrt_vol
                c = jnp.einsum("kgp,kng->knp", P.conj(), x)
                out = out + jnp.einsum("kgp,knp->kng", P,
                                       jnp.einsum("pq,knq->knp",
                                                  Dj.astype(c.dtype), c))
    return out * bd.mask[:, None, :]


def elastic_tensor_response(scfres, basis=None, cg_tol=1e-9, cg_maxiter=200,
                            dyson_tol=1e-8, sternheimer_tol=1e-10):
    """Voigt 6x6 elastic tensor C (Ha/bohr^3) by DFPT response.

    Insulators (T=0: ΩplusK CG route) AND metals (T>0: Dyson screening +
    occupation/Fermi-level response, like the metallic Γ-DFPT; reference
    src/postprocess/elastic.jl:34 differentiates solve_ΩplusK_split which
    handles metals via src/response/hessian.jl:266).  Requires a tightly
    converged scfres.  Validated against the finite-difference
    elastic_tensor (tests/test_elastic_resp.py).
    """
    # a strain perturbation does not have the crystal symmetry: evaluate on
    # the FULL k-point set (like phonons; the IBZ-weighted response would
    # leak symmetrized artifacts into C44 and the off-diagonal blocks)
    from .unfold import unfold_bz
    scfres = unfold_bz(scfres)
    basis = scfres.basis
    model = basis.model
    metallic = model.temperature > 0
    terms = basis.terms
    bd = basis.data
    vol = model.unit_cell_volume
    filled = model.filled_occupation
    if metallic:
        psi = jnp.asarray(scfres.psi)
        occ = jnp.asarray(scfres.occupation)
    else:
        n_occ = model.n_electrons // filled
        psi = jnp.asarray(scfres.psi[:, :n_occ])
        occ = jnp.full(psi.shape[:2], float(filled))
    L0 = jnp.asarray(np.asarray(model.lattice, dtype=float))

    # ---- clamped-orbital part: hessian of F(eps) ---------------------------
    # (at fixed psi AND occupations; the entropy is strain-independent at
    # fixed occupations so it drops out of the second derivative)
    def F(eps_vec):
        eps = sum(eps_vec[a] * _strain_mat(a) for a in range(6))
        L = (jnp.eye(3) + eps) @ L0
        return energy_at_lattice(basis, psi, occ, L)

    z6 = jnp.zeros(6)
    HF = np.asarray(jax.hessian(F)(z6))                  # [6, 6]
    gF = np.asarray(jax.grad(F)(z6))                     # dF/de_a = sigma Omega
    # C = d/de_b [(1/Omega) dF/de_a]; dOmega/de_b = Omega * tr(E_b)
    trE = np.array([np.trace(np.asarray(_strain_mat(a))) for a in range(6)])
    C = HF / vol - np.outer(gF, trE) / vol
    # finite-prestress geometric term: the FD route differentiates the
    # stress of the DEFORMED configuration, where incremental and base
    # strains compose as (1+e)(1+eps) = 1 + eps + e + e eps; the e*eps
    # cross term adds sum_ij gF_ij sym(E_a E_b)_ij.  For an isotropic
    # prestress sigma0 this is sigma0 * tr(E_a E_b) -- measured exactly on
    # compressed fcc Al (2.3e-4 at C11, half at C44) before the fix.
    # Vanishes at zero stress (why the equilibrium-silicon test never saw
    # it).  Reference: stress-strain coefficients vs energy second
    # derivatives, e.g. Wallace, "Thermodynamics of Crystals", ch. 1.
    gM = np.zeros((3, 3))
    for a, (i, j) in enumerate(_VOIGT):
        gM[i, j] = gM[j, i] = gF[a]
    for a in range(6):
        Ea = np.asarray(_strain_mat(a))
        for b in range(6):
            Eb = np.asarray(_strain_mat(b))
            sym = (Ea @ Eb + Eb @ Ea) / 2
            C[a, b] += np.sum(gM * sym) / vol

    # ---- bare strain derivatives of H psi (jvp through the metric) ---------
    rho0 = compute_density(bd, psi, occ, basis.fft_size, vol,
                           model.n_spin_components)
    rhs = []
    for a in range(6):
        Ea = _strain_mat(a)
        _, r_a = jax.jvp(
            lambda e: _strained_H_psi(basis, psi, occ, e * Ea, psi),
            (jnp.asarray(0.0),), (jnp.asarray(1.0),))
        rhs.append(r_a * bd.mask[:, None, :])

    w = bd.kweights[:, None] * occ
    if not metallic:
        from ..response.hessian import solve_omega_plus_k
        dpsi = [solve_omega_plus_k(basis, psi, occ, r_a, rho=rho0,
                                   cg_tol=cg_tol, cg_maxiter=cg_maxiter)
                for r_a in rhs]
        for a in range(6):
            for b in range(6):
                ov = jnp.einsum("kng,kng->kn", rhs[a].conj(), dpsi[b])
                C[a, b] += float(2.0 * jnp.sum(w * ov.real)) / vol
        return (C + C.T) / 2

    # ---- metallic response: Dyson screening + occupation response ----------
    # same structure as the metallic Γ-DFPT (response/phonon_dfpt.py):
    # screen each bare perturbation self-consistently, then take the
    # detailed chi0 apply for (dpsi, df); the free energy adds the
    # sum w df_b <psi|d_a H|psi> term (de Gironcoli PRB 51, 6773).
    from ..response.chi0 import apply_chi0, apply_chi0_generic, \
        make_chi0_context
    from ..response.hessian import apply_kernel, gmres
    ctx = make_chi0_context(scfres, basis)

    chi0_local = jax.jit(lambda dv: apply_chi0(ctx, basis, dv,
                                               tol=sternheimer_tol))
    kernel_f = jax.jit(lambda dr: apply_kernel(basis, rho0, dr))

    def matvec(drho):
        return drho - chi0_local(kernel_f(drho))

    def _dV_ind_psi(drho):
        dV_ind = apply_kernel(basis, rho0, drho)
        cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
            c, i, m, basis.fft_size))(psi, bd.Gidx, bd.mask)
        psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
        return jax.vmap(fftops.gather_from_cube)(
            jnp.fft.fftn(dV_ind[bd.kspin][:, None] * psir,
                         axes=(-3, -2, -1)), bd.Gidx, bd.mask)

    dpsi_all, df_all = [], []
    for r_a in rhs:
        drho_bare = apply_chi0_generic(ctx, basis, r_a, tol=sternheimer_tol)
        drho = gmres(matvec, drho_bare, tol=dyson_tol)
        rhs_tot = r_a + _dV_ind_psi(drho)
        _, dpsi_a, df_a, _ = apply_chi0_generic(ctx, basis, rhs_tot,
                                                tol=sternheimer_tol,
                                                with_detail=True)
        dpsi_all.append(dpsi_a)
        df_all.append(df_a)

    wk = bd.kweights[:, None]
    for a in range(6):
        dVnn_a = jnp.einsum("kng,kng->kn", psi.conj(), rhs[a]).real
        for b in range(6):
            ov = jnp.einsum("kng,kng->kn", dpsi_all[b].conj(), rhs[a])
            val = 2.0 * jnp.sum(w * ov.real) \
                + jnp.sum(wk * df_all[b] * dVnn_a)
            C[a, b] += float(val) / vol
    return (C + C.T) / 2
