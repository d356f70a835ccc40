"""Analytic DFPT dynamical matrices at arbitrary commensurate q.

Extends response/phonon_dfpt.py (Gamma only) to q != 0 (VERDICT #5,
reference src/transfer.jl:10-238 k+q machinery + src/response/chi0.jl at q):

  * k+q transfer WITHOUT a second basis: for a full (unfolded) k-grid
    containing q, wrap(k+q) = k_j is another grid point, and the response
    delta psi_{n,k+q} lives in the k_j Bloch sector.  The only extra
    bookkeeping is the integer shift G0 = k + q - k_j, applied as a phase
    e^{2 pi i G0.x} on the real-space grid.
  * delta rho_q(x) = sum_kn w f conj(u_nk) delta u_{n,k+q} e^{-2 pi i G0.x}
    (complex periodic part of the response at +q; densities.jl:60-108).
  * Hartree kernel at q: 4 pi / |q+G|^2 (no G=0 singularity for q != 0);
    XC kernel acts pointwise and extends to complex delta rho linearly.
  * Ewald dynamical matrix at q in reciprocal + real space (the classic
    eta-split; anchored at q=0 against jax.hessian of energy_ewald).

Insulators at T = 0, psps without NLCC (same restrictions as the Gamma
path); validated against the finite-difference IFC route frequencies in
tests/test_phonon_q.py.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc

from ..ops import fft as fftops
from ..ops import hamiltonian as hamops
from ..ops.ewald import default_eta, ewald_sum_bounds
from .chi0 import sternheimer_solver, make_chi0_context
from .phonon_dfpt import _atom_of_projector_column


# ---------------------------------------------------------------------------
# Ewald dynamical matrix at q  (smooth convention: phases carry tau)
# ---------------------------------------------------------------------------

def dynmat_ewald_q(lattice, charges, positions, q, eta=None,
                   Gbox=None, Rbox=None):
    """Ewald contribution to the dynamical matrix, Cartesian [na,3,na,3].

    "Smooth" convention: D_ab(q) = sum_R Phi(a0,bR) e^{2 pi i q.(x_b+R-x_a)}
    (related to the e^{iqR} gauge by diag(e^{-2 pi i q.x_a}); frequencies
    are identical).  Reciprocal part over K = B(G+q); real part over the
    erfc images; the q-independent self-force-constant sum enforces the
    acoustic sum rule at q = 0 exactly.
    """
    lattice = np.asarray(lattice, dtype=float)
    charges = np.asarray(charges, dtype=float)
    x = np.asarray(positions, dtype=float)            # [na, 3] reduced
    q = np.asarray(q, dtype=float)
    na = len(charges)
    if eta is None:
        eta = default_eta(lattice)
    if Gbox is None or Rbox is None:
        Gbox, Rbox = ewald_sum_bounds(lattice, x, eta)
    B = 2 * math.pi * np.linalg.inv(lattice.T)
    vol = abs(np.linalg.det(lattice))

    D = np.zeros((na, 3, na, 3), dtype=complex)

    # ---- reciprocal part ---------------------------------------------------
    def rec_sum(shift):
        """sum over K = B(G + shift) of KiKj w(K) e^{2 pi i G.dx}.

        The phase carries only the INTEGER G part: with the q-phase
        stripped this is the smooth convention, consistent with the
        real-space sum below (validated against supercell folding)."""
        Gint = Gbox.astype(float)                     # [ng, 3] reduced
        Gs = Gint + shift
        Kc = Gs @ B.T                                 # cartesian
        K2 = np.sum(Kc * Kc, axis=1)
        keep = K2 > 1e-18
        Kc, K2, Gint = Kc[keep], K2[keep], Gint[keep]
        w = np.exp(-K2 / (4 * eta ** 2)) / K2         # [ng]
        dx = x[:, None, :] - x[None, :, :]            # [na, na, 3]
        ph = np.exp(2j * math.pi * np.einsum("gd,abd->gab", Gint, dx))
        KK = Kc[:, :, None] * Kc[:, None, :]          # [ng, 3, 3]
        return np.einsum("g,gij,gab->aibj", w, KK, ph)

    pref = 4 * math.pi / vol
    ZZ = charges[:, None] * charges[None, :]
    Sq = rec_sum(q)                                   # [na,3,na,3]
    D += pref * np.einsum("ab,aibj->aibj", ZZ, Sq)
    # self term (q-independent): -delta_ab sum_c Z_a Z_c Re S0
    S0 = rec_sum(np.zeros(3)).real
    self_rec = pref * np.einsum("ac,aicj->aij", ZZ, S0)   # [na, 3, 3]
    for a in range(na):
        D[a, :, a, :] -= self_rec[a]

    # ---- real-space part ---------------------------------------------------
    # phi(r) = erfc(eta r)/r; H_ij = d^2 phi/dr_i dr_j
    def Hij(dcart):
        d2 = np.sum(dcart * dcart, axis=-1)
        d = np.sqrt(d2)
        u = eta * d
        expf = np.exp(-u * u)
        phi1 = -(erfc(u) / d2 + 2 * eta / math.sqrt(math.pi) * expf / d)  # phi'
        phi2 = (2 * erfc(u) / (d2 * d)
                + 4 * eta / math.sqrt(math.pi) * expf / d2
                + 4 * eta ** 3 / math.sqrt(math.pi) * expf)               # phi''
        dh = dcart / d[..., None]
        eye = np.eye(3)
        return (phi2[..., None, None] * dh[..., :, None] * dh[..., None, :]
                + (phi1 / d)[..., None, None]
                * (eye - dh[..., :, None] * dh[..., None, :]))

    R = Rbox.astype(float)                            # [nr, 3] reduced
    for a in range(na):
        for b in range(na):
            dred = x[a] - x[b] - R                    # [nr, 3]
            keep = np.sum(dred * dred, axis=1) > 1e-18
            dredk = dred[keep]
            if len(dredk) == 0:
                continue
            dcart = dredk @ lattice.T
            H = Hij(dcart)                            # [nr', 3, 3]
            phase = np.exp(-2j * math.pi * (dredk @ q))
            # pair term: -Z_a Z_b sum_R e^{-2 pi i q.(x_a-x_b-R)} H
            D[a, :, b, :] += -ZZ[a, b] * np.einsum("r,rij->ij", phase, H)
            # self term: +delta_ab contribution from ALL neighbours of a
            # (includes b over every atom; accumulate once via b loop)
            D[a, :, a, :] += ZZ[a, b] * np.einsum("rij->ij", H)

    return D


# ---------------------------------------------------------------------------
# k+q index maps
# ---------------------------------------------------------------------------

def kpq_maps(basis, q, tol=1e-8):
    """perm[ik] = index of wrap(k_ik + q) in the k list; G0[ik] integer shift
    with k + q = k_perm + G0.  Requires a q-commensurate unfolded grid."""
    kcoords = np.asarray(basis.kcoords_spin, dtype=float)
    q = np.asarray(q, dtype=float)
    nk = len(kcoords)
    perm = np.zeros(nk, dtype=int)
    G0 = np.zeros((nk, 3), dtype=int)
    for ik in range(nk):
        target = kcoords[ik] + q
        d = target[None, :] - kcoords                  # [nk, 3]
        dint = np.round(d)
        ok = np.all(np.abs(d - dint) < tol, axis=1)
        js = np.nonzero(ok)[0]
        if len(js) == 0:
            raise ValueError(
                f"k-point grid is not commensurate with q={q}: no partner "
                f"for k={kcoords[ik]} (unfold the BZ and use a grid "
                "containing q)")
        perm[ik] = js[0]
        G0[ik] = dint[js[0]].astype(int)
    return perm, G0


def _phase_grids(basis, G0):
    """e^{2 pi i G0.x} on the real grid per k-point [nk, n1,n2,n3]."""
    r = basis.r_cube                                   # [n1,n2,n3,3] reduced
    ph = np.exp(2j * np.pi * np.einsum("kd,xyzd->kxyz",
                                       G0.astype(float), r))
    return jnp.asarray(ph)


# ---------------------------------------------------------------------------
# chi0 / kernel at q
# ---------------------------------------------------------------------------

def _perm_ham(ham, perm):
    p = jnp.asarray(perm)
    return ham._replace(Gidx=ham.Gidx[p], mask=ham.mask[p], kin=ham.kin[p],
                        kspin=ham.kspin[p],
                        P=None if ham.P is None else ham.P[p])


def apply_kernel_q(basis, rho0, drho_q, q):
    """K(q) drho_q: Hartree at |q+G| plus the local XC kernel, complex.

    drho_q [nspin, grid] complex (periodic part at +q).  The XC kernel is
    real and local, so it acts on re/im parts independently; the Hartree
    coefficients lose their G=0 singularity at q != 0.
    """
    model = basis.model
    terms = basis.terms
    B = 2 * np.pi * np.linalg.inv(np.asarray(model.lattice).T)
    Gq = (basis.G_cube.astype(float) + np.asarray(q, dtype=float)) @ B.T
    Gq2 = np.sum(Gq * Gq, axis=-1)
    coeffs = jnp.asarray(np.where(Gq2 > 1e-14,
                                  4 * math.pi / np.where(Gq2 > 1e-14, Gq2, 1),
                                  0.0))
    drho_tot = jnp.sum(drho_q, axis=0)
    dVH = jnp.fft.ifftn(coeffs * jnp.fft.fftn(drho_tot))
    dVH = dVH[None] * (terms.hartree_scaling or 0.0)

    # XC kernel (local, real): jvp of Vxc at rho0, applied to re and im
    from .hessian import apply_kernel
    if terms.xc:
        # subtract the Hartree part of the full kernel jvp (at q=0 coeffs)
        def xc_only(dr):
            Gcart = jnp.asarray(basis.G_cube_cart)
            from ..ops.hamiltonian import xc_energy

            def vxc(r):
                if terms.rho_core_np is not None:
                    r = r + jnp.asarray(terms.rho_core_np)[None] / r.shape[0]
                N = r.shape[-1] * r.shape[-2] * r.shape[-3]
                dvol = model.unit_cell_volume / N
                return jax.grad(
                    lambda rr: xc_energy(terms.xc, rr, Gcart,
                                         model.unit_cell_volume,
                                         terms.xc_scaling))(r) / dvol
            _, dV = jax.jvp(vxc, (rho0,), (dr,))
            return dV
        dVxc = xc_only(jnp.real(drho_q)) + 1j * xc_only(jnp.imag(drho_q))
    else:
        dVxc = jnp.zeros_like(drho_q)
    return dVH + dVxc


class QContext:
    """Precomputed k+q bookkeeping for one (basis, q)."""

    def __init__(self, basis, q):
        self.q = np.asarray(q, dtype=float)
        self.perm, self.G0 = kpq_maps(basis, q)
        self.phase = _phase_grids(basis, self.G0)     # e^{+2 pi i G0.x}
        self.is_gamma = np.allclose(self.q, 0) and np.all(self.G0 == 0)


def sternheimer_q(ctx, basis, qctx: QContext, rhs_sector, tol=1e-10,
                  occupation_threshold=1e-8):
    """Solve the k+q Sternheimer equations (+ the metallic explicit
    divided-difference pairs when T > 0).

    rhs_sector [nk, nb, nG]: dH_q psi_{nk} already expressed in the
    wrap(k+q) sector (slot ik holds a vector on the sphere of k_perm[ik]).
    Returns dpsi in the same sector layout.
    """
    model = basis.model
    bd = basis.data
    perm = qctx.perm
    p = jnp.asarray(perm)
    hamq = _perm_ham(ctx.ham, perm)
    apply = lambda v: hamops.apply_H(hamq, v, basis.fft_size,
                                     basis.model.unit_cell_volume)
    occ_mask = ctx.occupation > occupation_threshold
    psi_occ_q = (ctx.psi * occ_mask[:, :, None])[p]    # projector at k+q
    rhs = rhs_sector * occ_mask[:, :, None]
    dpsi = sternheimer_solver(apply, psi_occ_q, ctx.eigenvalues, rhs,
                              hamq.kin, bd.mask[p], tol=tol)
    dpsi = dpsi * occ_mask[:, :, None]

    # metallic explicit pairs among the partially occupied bands of
    # (m at k+q, n at k): alpha_mn = ratio f_n/(f_n^2 + f_m^2), ratio the
    # occupation divided difference; m == n IS included at q != 0
    # (reference chi0.jl:399-412, no separate delta-occ/Fermi term)
    T = model.temperature
    if T > 0 and model.smearing is not None:
        from ..models.smearing import (NoSmearing,
                                       occupation_divided_difference)
        if not isinstance(model.smearing, NoSmearing):
            eps_kq = ctx.eigenvalues[p]                # [k, m] at k+q
            occ_kq = ctx.occupation[p]
            em = eps_kq[:, :, None]
            en = ctx.eigenvalues[:, None, :]
            ratio = occupation_divided_difference(
                model.smearing, em * jnp.ones_like(en),
                en * jnp.ones_like(em), ctx.epsF, T) \
                * model.filled_occupation
            fm = occ_kq[:, :, None]
            fn = ctx.occupation[:, None, :]
            alpha = ratio * fn / jnp.maximum(fn ** 2 + fm ** 2, 1e-30)
            pair_mask = ((occ_kq > occupation_threshold)[:, :, None]
                         & occ_mask[:, None, :])
            if qctx.is_gamma:
                nb = ctx.psi.shape[1]
                pair_mask = pair_mask & ~jnp.eye(nb, dtype=bool)[None]
            alpha = jnp.where(pair_mask, alpha, 0.0)
            psi_kq = ctx.psi[p]
            dots = jnp.einsum("kmg,kng->kmn", psi_kq.conj(), rhs_sector)
            dpsi = dpsi + jnp.einsum("kmn,kmg->kng",
                                     alpha.astype(dots.dtype) * dots,
                                     psi_kq) * occ_mask[:, :, None]
    return dpsi


def drho_q_from_dpsi(ctx, basis, qctx: QContext, dpsi_sector,
                     occupation_threshold=1e-8):
    """delta rho_q(x) = sum w f conj(u_nk) du_sector e^{-2 pi i G0.x}."""
    bd = basis.data
    fft_size = basis.fft_size
    vol = basis.model.unit_cell_volume
    nspin = basis.model.n_spin_components
    p = jnp.asarray(qctx.perm)

    occ_mask = ctx.occupation > occupation_threshold
    occ_w = jnp.where(occ_mask, ctx.occupation, 0.0)

    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(ctx.psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
    dcube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                     )(dpsi_sector, bd.Gidx[p], bd.mask[p])
    dpsir = jnp.fft.ifftn(dcube, axes=(-3, -2, -1))

    N = int(np.prod(fft_size))
    scale = (N / math.sqrt(vol)) ** 2
    # factor 2: the -q branch (driven by u*) contributes the time-reversal
    # partner of each +q term to delta rho_q (QE's classic factor; reduces
    # to the Gamma code's 2 Re(psi* dpsi) as q -> 0)
    contrib = 2 * scale * psir.conj() * dpsir * jnp.conj(qctx.phase)[:, None]
    w = bd.kweights[:, None] * occ_w
    drho_k = jnp.einsum("kn,knxyz->kxyz", w, contrib)
    if nspin == 1:
        return jnp.sum(drho_k, axis=0)[None]
    sel = jax.nn.one_hot(bd.kspin, nspin, dtype=jnp.float64)
    return jnp.einsum("ks,kxyz->sxyz", sel.astype(drho_k.dtype), drho_k)


def dv_times_psi_q(ctx, basis, qctx: QContext, dv_grid):
    """(e^{2 pi i q.x} dv_per) psi_nk gathered on the wrap(k+q) spheres.

    dv_grid [nspin, grid] complex periodic part.  Includes the e^{2 pi i
    G0.x} sector phase.
    """
    bd = basis.data
    fft_size = basis.fft_size
    p = jnp.asarray(qctx.perm)
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(ctx.psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
    dv_k = dv_grid[bd.kspin]                           # [nk, grid]
    prod = dv_k[:, None] * psir * qctx.phase[:, None]
    return jax.vmap(fftops.gather_from_cube)(
        jnp.fft.fftn(prod, axes=(-3, -2, -1)), bd.Gidx[p], bd.mask[p])


# ---------------------------------------------------------------------------
# bare perturbations at q
# ---------------------------------------------------------------------------

def _dvloc_q_grids(basis, q):
    """Periodic part of dV_loc/du_{s,alpha} at +q: complex grids
    [na, 3, n1,n2,n3]; Fourier coefficients at wavevectors q+G."""
    model = basis.model
    Gq_red = basis.G_cube.reshape(-1, 3).astype(float) + np.asarray(q, float)
    B = 2 * np.pi * np.linalg.inv(np.asarray(model.lattice).T)
    Gq_cart = Gq_red @ B.T
    Gq_norm = np.linalg.norm(Gq_cart, axis=-1)
    N = np.prod(basis.fft_size)
    vol = model.unit_cell_volume
    na = len(model.atoms)
    out = np.zeros((na, 3) + tuple(basis.fft_size), dtype=complex)
    ff_cache = {}
    for s, at in enumerate(model.atoms):
        if not hasattr(at, "local_potential_fourier"):
            continue
        if at not in ff_cache:
            ff_cache[at] = np.asarray(at.local_potential_fourier(Gq_norm))
        phase = np.exp(-2j * math.pi * (Gq_red @ np.asarray(
            model.positions[s])))
        base = ff_cache[at] * phase / math.sqrt(vol)
        for alpha in range(3):
            dv = (-1j * Gq_cart[:, alpha]) * base
            out[s, alpha] = np.fft.ifftn(dv.reshape(basis.fft_size)) \
                * (N / math.sqrt(vol))
    return out


def _bare_rhs_q(basis, ctx, qctx: QContext, dvloc_q):
    """rhs[(s,alpha)] = (dH_q^{(s,alpha)} psi)_{k -> wrap(k+q) sector}."""
    bd = basis.data
    model = basis.model
    p = jnp.asarray(qctx.perm)
    psi = ctx.psi
    na = dvloc_q.shape[0]

    # nonlocal: P_{k+q} in the sector = projectors evaluated at Gpk of the
    # PERMUTED k-points shifted... Since wrap(k+q) = k_perm exactly, the
    # sector's own projectors ARE P[perm]; the perturbation derivative
    # brings -i (k+q+G)_alpha on the bra side and -i (k+G)_alpha on the ket:
    #   dH_nl = |dP_{k+q}> D <P_k| + |P_{k+q}> D <dP_k|,   dP = -i Gpk P
    P, D = ctx.ham.P, ctx.ham.D
    have_nl = P is not None and P.shape[-1] > 0
    if have_nl:
        atom_col = _atom_of_projector_column(basis)
        Pq = P[p]
        Gpk_q = bd.Gpk_cart[p]                          # (k+q)+G cartesian
        c = jnp.einsum("kgp,kng->knp", P.conj(), psi)   # <P_k|psi_nk>
        Dc = jnp.einsum("pq,knq->knp", D, c)

    rhs = []
    for s in range(na):
        # No extra q- or sector-phases: with our P convention (structure
        # factor e^{-2 pi i G.x_s}, derivative factor -i(kappa+G)) the
        # cross-sector perturbation carries them implicitly.  Validated
        # against a supercell finite difference of the bare nonlocal
        # operator (proportionality residual ~1e-10).
        for alpha in range(3):
            r = dv_times_psi_q(ctx, basis, qctx,
                               jnp.asarray(dvloc_q[s, alpha])[None])
            if have_nl:
                sel = jnp.asarray((atom_col == s).astype(float))
                dPq = (-1j) * Gpk_q[:, :, alpha, None] * Pq \
                    * sel[None, None, :]
                dPk = (-1j) * bd.Gpk_cart[:, :, alpha, None] * P \
                    * sel[None, None, :]
                dc = jnp.einsum("kgp,kng->knp", dPk.conj(), psi)
                Ddc = jnp.einsum("pq,knq->knp", D, dc)
                Psel = Pq * sel[None, None, :]
                r = r + (jnp.einsum("kgp,knp->kng", dPq,
                                    Dc * sel[None, None, :])
                         + jnp.einsum("kgp,knp->kng", Psel, Ddc))
            rhs.append(r * bd.mask[p][:, None, :])
    return rhs


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def dynmat_dfpt_q(scfres, q, tol=1e-7, sternheimer_tol=1e-10,
                  maxiter=40, verbose=False):
    """Cartesian force-constant matrix [3na, 3na] at reduced q by DFPT
    (complex Hermitian; smooth convention).  Insulators, T = 0."""
    if (np.allclose(np.asarray(q, dtype=float), 0)
            and scfres.basis.model.temperature > 0):
        # metallic q=0 carries the delta-occ/Fermi-shift terms that live in
        # the Gamma-specialized assembly
        from .phonon_dfpt import dynmat_dfpt_gamma
        return dynmat_dfpt_gamma(scfres, tol=tol,
                                 sternheimer_tol=sternheimer_tol,
                                 acoustic_sum_rule=False,
                                 verbose=verbose).astype(complex)
    from ..postprocess.unfold import unfold_bz
    scfres = unfold_bz(scfres)
    basis = scfres.basis
    model = basis.model
    if basis.terms.rho_core_np is not None:
        raise NotImplementedError("q != 0 DFPT with NLCC not implemented")
    na = len(model.atoms)
    rho0 = jnp.asarray(scfres.rho)
    ctx = make_chi0_context(scfres, basis)
    qctx = QContext(basis, q)
    bd = basis.data

    # ---- clamped-ion part --------------------------------------------------
    # electronic clamped term is diagonal in atoms and q-independent
    # (E_loc linear, E_nl quadratic in a SINGLE atom's structure factor)
    from ..postprocess.forces import _positions_energy
    from ..ops.ewald import energy_ewald
    positions = jnp.asarray(np.stack(model.positions))
    H_full = np.asarray(jax.hessian(
        lambda pos: _positions_energy(basis, scfres.psi, scfres.occupation,
                                      scfres.rho, pos))(positions))
    charges = np.array([at.charge_ionic() for at in model.atoms], dtype=float)
    eta = default_eta(model.lattice)
    Gbox, Rbox = ewald_sum_bounds(model.lattice, np.stack(model.positions),
                                  eta)
    H_ew = np.asarray(jax.hessian(
        lambda pos: energy_ewald(model.lattice, charges, pos, eta=eta,
                                 Gbox=Gbox, Rbox=Rbox))(positions))
    H_el = H_full - H_ew                              # [na,3,na,3] reduced
    Linv = np.linalg.inv(model.lattice)
    C_el = np.einsum("aA,satb,bB->sAtB", Linv, H_el, Linv)
    C = np.zeros((na, 3, na, 3), dtype=complex)
    for a in range(na):
        C[a, :, a, :] = C_el[a, :, a, :]              # diagonal blocks only
    D_ew = dynmat_ewald_q(model.lattice, charges, np.stack(model.positions),
                          q, eta=eta, Gbox=Gbox, Rbox=Rbox)
    # convert the Ewald part from the smooth to the GAUGE (e^{iqR})
    # convention used by the electronic response and the IFC route
    ph = np.exp(2j * math.pi * (np.stack(model.positions)
                                @ np.asarray(q, dtype=float)))
    C += np.einsum("a,aibj,b->aibj", ph, D_ew, ph.conj())

    # ---- response part (gauge convention: u_sR = u_s e^{iqR}) --------------
    dvloc_q = _dvloc_q_grids(basis, q)
    rhs_list = _bare_rhs_q(basis, ctx, qctx, dvloc_q)

    from .hessian import gmres

    def chi0_q(dv):
        rhs = dv_times_psi_q(ctx, basis, qctx, dv)
        dpsi = sternheimer_q(ctx, basis, qctx, rhs, tol=sternheimer_tol)
        return drho_q_from_dpsi(ctx, basis, qctx, dpsi)

    kernel_q = lambda dr: apply_kernel_q(basis, rho0, dr, q)

    def matvec(drho):
        return drho - chi0_q(kernel_q(drho))

    occ = jnp.asarray(scfres.occupation)
    w = bd.kweights[:, None] * occ

    dpsi_all = []
    for j, rhs in enumerate(rhs_list):
        dpsi_b = sternheimer_q(ctx, basis, qctx, rhs, tol=sternheimer_tol)
        drho_bare = drho_q_from_dpsi(ctx, basis, qctx, dpsi_b)
        drho = gmres(matvec, drho_bare, tol=tol, maxiter=maxiter,
                     verbose=verbose)
        dV_ind = kernel_q(drho)
        rhs_tot = rhs + dv_times_psi_q(ctx, basis, qctx, dV_ind)
        dpsi = sternheimer_q(ctx, basis, qctx, rhs_tot, tol=sternheimer_tol)
        dpsi_all.append(dpsi)
        if verbose:
            print(f"  q-perturbation {j + 1}/{len(rhs_list)} solved")

    C_resp = np.zeros((3 * na, 3 * na), dtype=complex)
    for s in range(3 * na):
        for t in range(3 * na):
            ov_st = jnp.einsum("kng,kng->kn", rhs_list[s].conj(),
                               dpsi_all[t])
            ov_ts = jnp.einsum("kng,kng->kn", dpsi_all[s].conj(),
                               rhs_list[t])
            C_resp[s, t] = complex(jnp.sum(w * (ov_st + ov_ts)))
    C = C.reshape(3 * na, 3 * na) + C_resp
    return (C + C.conj().T) / 2


def phonon_modes_dfpt_q(scfres, q, **kwargs):
    """Frequencies (Ha) + eigenvectors at q from the DFPT dynmat."""
    from ..postprocess.phonon import ATOMIC_MASSES_U, AMU_TO_ME
    C = dynmat_dfpt_q(scfres, q, **kwargs)
    atoms = scfres.basis.model.atoms
    masses = np.array([ATOMIC_MASSES_U[at.symbol] * AMU_TO_ME
                       for at in atoms])
    msqrt = np.repeat(np.sqrt(masses), 3)
    D = C / np.outer(msqrt, msqrt)
    w2, vecs = np.linalg.eigh((D + D.conj().T) / 2)
    return np.sign(w2) * np.sqrt(np.abs(w2)), vecs
