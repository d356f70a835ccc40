"""Analytic (DFPT) dynamical matrix at Gamma via Sternheimer response.

Counterpart of the reference's phonon DFPT (DFTK `src/postprocess/phonon.jl`
+ `src/response/`): instead of displacing atoms in supercells, the second
derivative of the total energy is assembled as

    C[s a, t b] = d2E_explicit / du du'   (clamped ion: local + nonlocal +
                                           Ewald at FIXED psi, rho - a
                                           jax.hessian of the same
                                           position-energy the forces use)
                + 2 Re sum_kn w f <dpsi^{(t b)} | dH^{(s a)}_bare psi_n>

with dH_bare = dV_loc + dV_nl the bare perturbation of one Cartesian
displacement and dpsi the SELF-CONSISTENTLY screened first-order orbitals
(Dyson via GMRES over chi_0, then one Sternheimer solve with the screened
perturbation).  Insulators at T = 0 (metallic occupation response of the
displacement perturbation is not implemented here).

Validated against the finite-difference supercell dynamical matrix
(tests/test_dfpt_phonon.py).
"""
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fft as fftops
from ..ops import hamiltonian as hamops
from ..ops.terms import ElementPsp, count_n_proj
from .chi0 import apply_chi0, make_chi0_context, sternheimer_solver
from .hessian import apply_kernel, gmres


# ---------------------------------------------------------------------------
# bare perturbations dH^{(s,alpha)} psi
# ---------------------------------------------------------------------------

def _dVloc_grids(basis):
    """d V_loc / d u_{s, alpha}  real grids [n_atoms, 3, n1, n2, n3].

    V_loc(G) = sum_s ff_s(|G|) e^{-2 pi i G_red . r_s} / sqrt(vol);
    d/d u_cart,alpha brings down (-i G_cart,alpha).
    """
    model = basis.model
    Gnorm = basis.G_cube_cart_norm.reshape(-1)
    Gred = basis.G_cube.reshape(-1, 3).astype(float)
    Gcart = basis.G_cube_cart.reshape(-1, 3)
    N = np.prod(basis.fft_size)
    vol = model.unit_cell_volume
    na = len(model.atoms)
    out = np.zeros((na, 3) + tuple(basis.fft_size))
    ff_cache = {}
    for s, at in enumerate(model.atoms):
        if not hasattr(at, "local_potential_fourier"):
            continue
        if at not in ff_cache:
            ff_cache[at] = np.asarray(at.local_potential_fourier(Gnorm))
        phase = np.exp(-2j * math.pi * (Gred @ np.asarray(model.positions[s])))
        base = ff_cache[at] * phase / math.sqrt(vol)
        for alpha in range(3):
            dv = (-1j * Gcart[:, alpha]) * base
            out[s, alpha] = np.fft.ifftn(dv.reshape(basis.fft_size)).real \
                * (N / math.sqrt(vol))
    return out


def _atom_of_projector_column(basis):
    """[n_proj] atom index per nonlocal projector column (terms.py order)."""
    model = basis.model
    cols = []
    psp_groups = [g for g in model.atom_groups
                  if isinstance(model.atoms[g[0]], ElementPsp)]
    for group in psp_groups:
        np_atom = count_n_proj(model.atoms[group[0]].psp)
        for atom_idx in group:
            cols.extend([atom_idx] * np_atom)
    return np.array(cols, dtype=int)


def _bare_rhs(basis, ctx, dVloc_np):
    """rhs[j][nk, nb, nG] = dH^{(j)}_bare psi for j = (s, alpha) flattened."""
    bd = basis.data
    fft_size = basis.fft_size
    vol = basis.model.unit_cell_volume
    psi = ctx.psi
    na = dVloc_np.shape[0]

    # local part: dV psi through the FFT grid
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))

    def dV_psi(dV):
        return jax.vmap(fftops.gather_from_cube)(
            jnp.fft.fftn(dV[None, None] * psir, axes=(-3, -2, -1)),
            bd.Gidx, bd.mask)

    # nonlocal part: dP D (P^H psi) + P D (dP^H psi)
    P, D = ctx.ham.P, ctx.ham.D
    have_nl = P is not None and P.shape[-1] > 0
    if have_nl:
        atom_col = _atom_of_projector_column(basis)
        c = jnp.einsum("kgp,kng->knp", P.conj(), psi)
        Dc = jnp.einsum("pq,knq->knp", D, c)

    rhs = []
    for s in range(na):
        for alpha in range(3):
            r = dV_psi(jnp.asarray(dVloc_np[s, alpha]))
            if have_nl:
                sel = jnp.asarray((atom_col == s).astype(float))
                dP = (-1j) * bd.Gpk_cart[:, :, alpha, None] * P * sel[None, None, :]
                dc = jnp.einsum("kgp,kng->knp", dP.conj(), psi)
                Ddc = jnp.einsum("pq,knq->knp", D, dc)
                r = r + jnp.einsum("kgp,knp->kng", dP, Dc)
                r = r + jnp.einsum("kgp,knp->kng", P, Ddc)
            rhs.append(r * bd.mask[:, None, :])
    return rhs


# ---------------------------------------------------------------------------
# chi_0 with a general (not necessarily local-potential) rhs
# ---------------------------------------------------------------------------

def _chi0_rhs(ctx, basis, rhs, tol=1e-10, occupation_threshold=1e-8):
    """delta_rho from the bare rhs = dH psi (insulating response)."""
    model = basis.model
    bd = basis.data
    fft_size = basis.fft_size
    vol = model.unit_cell_volume
    nspin = model.n_spin_components

    psi, occ, eps = ctx.psi, ctx.occupation, ctx.eigenvalues
    apply = lambda p: hamops.apply_H(ctx.ham, p, fft_size, vol)

    occ_mask = occ > occupation_threshold
    occ_w = jnp.where(occ_mask, occ, 0.0)
    psi_occ = psi * occ_mask[:, :, None]
    dpsi = sternheimer_solver(apply, psi_occ, eps, rhs * occ_mask[:, :, None],
                              ctx.ham.kin, bd.mask, tol=tol)
    dpsi = dpsi * occ_mask[:, :, None]

    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
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
    return drho, dpsi


def _screened_dpsi(ctx, basis, rhs, drho, rho0, tol=1e-10,
                   occupation_threshold=1e-8):
    """First-order orbitals for the SCREENED perturbation dH + K drho."""
    bd = basis.data
    fft_size = basis.fft_size
    vol = basis.model.unit_cell_volume
    dV_ind = apply_kernel(basis, rho0, drho)          # [nspin, grid]
    psi = ctx.psi
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                    )(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
    dVpsi = jax.vmap(fftops.gather_from_cube)(
        jnp.fft.fftn(dV_ind[bd.kspin][:, None] * psir, axes=(-3, -2, -1)),
        bd.Gidx, bd.mask)
    rhs_tot = rhs + dVpsi

    occ_mask = ctx.occupation > occupation_threshold
    psi_occ = psi * occ_mask[:, :, None]
    apply = lambda p: hamops.apply_H(ctx.ham, p, fft_size, vol)
    dpsi = sternheimer_solver(apply, psi_occ, ctx.eigenvalues,
                              rhs_tot * occ_mask[:, :, None],
                              ctx.ham.kin, bd.mask, tol=tol)
    return dpsi * occ_mask[:, :, None]


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def dynmat_dfpt_gamma(scfres, tol=1e-7, sternheimer_tol=1e-10,
                      acoustic_sum_rule=True, verbose=False):
    """Cartesian force-constant matrix [3 na, 3 na] at q = 0 by DFPT.

    Works for insulators AND metals (T > 0: the free-energy second
    derivative adds the occupation-response term sum w df <psi|dV|psi>
    and the divided-difference band pairs inside chi0; de Gironcoli,
    PRB 51, 6773 (1995)).  Requires a tightly converged scfres.
    Mass-weight and diagonalize with
    `postprocess.phonon.phonon_modes_from_dynmat`.
    """
    # A single-atom displacement does NOT have the crystal symmetry, so the
    # response must be evaluated on the FULL k-point set: unfold the IBZ
    # result first (the reference handles this by marking the perturbation's
    # reduced symmetry; unfolding is the robust equivalent here).
    from ..postprocess.unfold import unfold_bz
    scfres = unfold_bz(scfres)
    basis = scfres.basis
    model = basis.model
    metallic = model.temperature > 0
    na = len(model.atoms)
    rho0 = jnp.asarray(scfres.rho)
    ctx = make_chi0_context(scfres, basis)

    # ---- clamped-ion second derivative (AD through the forces energy) ------
    from ..postprocess.forces import _positions_energy
    positions = jnp.asarray(np.stack(model.positions))
    H_red = jax.hessian(
        lambda pos: _positions_energy(basis, scfres.psi, scfres.occupation,
                                      scfres.rho, pos))(positions)
    H_red = np.asarray(H_red)                         # [na,3,na,3] reduced
    Linv = np.linalg.inv(model.lattice)
    C = np.einsum("aA,satb,bB->sAtB", Linv, H_red, Linv)

    # ---- response part ------------------------------------------------------
    dVloc = _dVloc_grids(basis)
    rhs_list = _bare_rhs(basis, ctx, dVloc)           # 3 na bare dH psi

    chi0_local = jax.jit(lambda dv: apply_chi0(ctx, basis, dv,
                                               tol=sternheimer_tol))
    kernel_f = jax.jit(lambda dr: apply_kernel(basis, rho0, dr))

    def matvec(drho):
        return drho - chi0_local(kernel_f(drho))

    bd = basis.data
    occ = jnp.asarray(scfres.occupation)
    w = bd.kweights[:, None] * occ
    from .chi0 import apply_chi0_generic

    def _dV_ind_psi(drho):
        dV_ind = apply_kernel(basis, rho0, drho)
        psi = ctx.psi
        cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
            c, i, m, basis.fft_size))(psi, bd.Gidx, bd.mask)
        psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
        return jax.vmap(fftops.gather_from_cube)(
            jnp.fft.fftn(dV_ind[bd.kspin][:, None] * psir,
                         axes=(-3, -2, -1)), bd.Gidx, bd.mask)

    dpsi_all, df_all = [], []
    for j, rhs in enumerate(rhs_list):
        drho_bare = apply_chi0_generic(ctx, basis, rhs, tol=sternheimer_tol)
        drho = gmres(matvec, drho_bare, tol=tol, verbose=verbose)
        rhs_tot = rhs + _dV_ind_psi(drho)
        _, dpsi, df, _ = apply_chi0_generic(ctx, basis, rhs_tot,
                                            tol=sternheimer_tol,
                                            with_detail=True)
        dpsi_all.append(dpsi)
        df_all.append(df)
        if verbose:
            print(f"  perturbation {j + 1}/{len(rhs_list)} solved")

    C_resp = np.zeros((3 * na, 3 * na))
    wk = bd.kweights[:, None]
    for s in range(3 * na):
        # bare diagonal matrix elements <psi_n | d_s H | psi_n>
        dVnn_s = jnp.einsum("kng,kng->kn", ctx.psi.conj(),
                            rhs_list[s]).real
        for t in range(3 * na):
            ov = jnp.einsum("kng,kng->kn", dpsi_all[t].conj(), rhs_list[s])
            val = 2.0 * jnp.sum(w * ov.real)
            if metallic:
                # occupation response of the free energy:
                # sum w df_n^{(t)} <psi|d_s V|psi>_n (de Gironcoli 1995)
                val = val + jnp.sum(wk * df_all[t] * dVnn_s)
            C_resp[s, t] = float(val)
    C = C.reshape(3 * na, 3 * na) + C_resp
    C = (C + C.T) / 2

    if acoustic_sum_rule:
        blocks = C.reshape(na, 3, na, 3)
        corr = blocks.sum(axis=2)                     # [na, 3, 3]
        for s in range(na):
            blocks[s, :, s, :] -= corr[s]
        C = blocks.reshape(3 * na, 3 * na)
    return C


def phonon_modes_dfpt_gamma(scfres, **kwargs):
    """Frequencies (Ha) + eigenvectors at Gamma from the DFPT dynmat."""
    from ..postprocess.phonon import phonon_modes_from_dynmat
    C = dynmat_dfpt_gamma(scfres, **kwargs)
    return phonon_modes_from_dynmat(C, scfres.basis.model.atoms)
