"""Stresses in the split-real (complex-free) engine: chip-runnable lattice AD.

Twin of postprocess/stresses.py for TPUs that reject complex dtypes / x64:
the total energy is one real jnp function of the lattice matrix; every
lattice-dependent quantity (reciprocal metric, |k+G|^2, Poisson kernel, XC
gradient contractions, form factors) is recomputed inside the traced graph,
while the structure factors (reduced positions, lattice-independent) stay
static split-complex arrays.  The Ewald + PspCorrection pieces are added
host-side from f64 numpy finite differences of the strain (they carry no
orbital data).

Measured on the real TPU v5e (f32 device arithmetic, same-state
comparison): max |sigma_chip - sigma_cpu_f64| = 3.9e-10 Ha/bohr^3 on
strained silicon.

Reference: src/postprocess/stresses.jl:28.
"""
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.dft_matmul import dft3
from ..models.elements import ElementPsp
from ..utils.special import LM_INDEX, solid_harmonics_real
from .engine_split import (make_symmetrizer_split, scatter_cube_split,
                           xc_energy_split)


class SplitStressData(NamedTuple):
    """Static (lattice-independent) arrays for the split stress graph."""
    Gred_cube: jnp.ndarray       # [n1,n2,n3,3] reduced cube G (float)
    Gred_pk: jnp.ndarray         # [nk, nG, 3] reduced k+G
    sf_loc: tuple                # per group: [M, 2] summed structure factor
    sf_nl: tuple                 # per psp group: [natoms_in_group, nk, nG, 2]
    Gidx: jnp.ndarray
    mask: jnp.ndarray
    kspin: jnp.ndarray
    kweights: jnp.ndarray


def prepare_stress_data(basis, dtype=jnp.float32):
    model = basis.model
    Gred_flat = basis.G_cube.reshape(-1, 3).astype(np.float64)

    sf_loc = []
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        sf = np.zeros(Gred_flat.shape[0], dtype=np.complex128)
        for i in group:
            sf += np.exp(-2j * np.pi * (Gred_flat @ model.positions[i]))
        sf_loc.append(jnp.asarray(
            np.stack([sf.real, sf.imag], -1), dtype=dtype))

    Gred_pk = basis.Gred_np.astype(np.float64) \
        + basis.kcoords_spin[:, None, :]
    sf_nl = []
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not (isinstance(el, ElementPsp) and el.psp.n_proj() > 0):
            continue
        sfs = []
        for i in group:
            s = np.exp(-2j * np.pi * (Gred_pk @ model.positions[i]))
            sfs.append(np.stack([s.real, s.imag], -1))
        sf_nl.append(jnp.asarray(np.stack(sfs), dtype=dtype))

    return SplitStressData(
        Gred_cube=jnp.asarray(basis.G_cube.astype(np.float64), dtype=dtype),
        Gred_pk=jnp.asarray(Gred_pk, dtype=dtype),
        sf_loc=tuple(sf_loc), sf_nl=tuple(sf_nl),
        Gidx=jnp.asarray(basis.Gidx_np),
        mask=jnp.asarray(basis.mask_np, dtype=dtype),
        kspin=jnp.asarray(basis.kspin),
        kweights=jnp.asarray(basis.kweights, dtype=dtype))


def energy_at_lattice_split(basis, st: SplitStressData, xy, wocc, lattice,
                            symmetrizer=None, include="all"):
    """Total energy (minus Ewald/PspCorrection/Entropy) as a real function
    of the lattice; xy [nk, nb, nG, 2] and wocc [nk, nb] fixed.

    symmetrizer must be built OUTSIDE any trace (make_symmetrizer_split
    builds its gather maps eagerly with jnp ops).

    include: "all" | "psi" (kinetic + nonlocal, the band-heavy on-chip
    part) | "density" (local + Hartree + XC, which need only the density:
    computed host-side in f64 by compute_stresses_split because their
    volume-scaled cube reductions dominate the f32 stress error -- the
    same split as compute_forces_split's with_local=False)."""
    model = basis.model
    terms = basis.terms
    fft_size = basis.fft_size
    N = int(np.prod(fft_size))
    dt = xy.dtype

    B = (2 * jnp.pi * jnp.linalg.inv(lattice.T)).astype(dt)
    vol = jnp.abs(jnp.linalg.det(lattice)).astype(dt)
    sqrt_vol = jnp.sqrt(vol)

    with_psi = include in ("all", "psi")
    with_density = include in ("all", "density")

    # --- kinetic ------------------------------------------------------------
    Gpk_cart = jnp.einsum("ab,knb->kna", B, st.Gred_pk)
    E_kin = jnp.asarray(0.0, dtype=dt)
    if with_psi:
        kin = 0.5 * jnp.sum(Gpk_cart * Gpk_cart, axis=-1) * st.mask
        abs2_G = jnp.sum(xy * xy, axis=-1)               # [nk, nb, nG]
        E_kin = jnp.sum(wocc[:, :, None] * kin[:, None, :] * abs2_G) \
            * terms.kinetic_scale

    if not with_density:
        return E_kin + _nonlocal_energy_at_lattice(
            basis, st, xy, wocc, Gpk_cart, vol, sqrt_vol, dt)

    # --- density from xy (volume normalisation traced) ----------------------
    cube = scatter_cube_split(xy, st.Gidx, st.mask, fft_size)
    psir = dft3(cube, sign=+1) / sqrt_vol
    dens_k = jnp.einsum("kn,knxyz->kxyz", wocc,
                        jnp.sum(psir * psir, axis=-1))
    nspin = model.n_spin_components
    if nspin == 1:
        rho = jnp.sum(dens_k, axis=0)[None]
    else:
        sel = jax.nn.one_hot(st.kspin, nspin, dtype=dens_k.dtype)
        rho = jnp.einsum("ks,kxyz->sxyz", sel, dens_k)
    if symmetrizer is not None:
        rho = symmetrizer(rho)
    rho_tot = jnp.sum(rho, axis=0)
    rho_G = dft3(jnp.stack([rho_tot, jnp.zeros_like(rho_tot)], -1),
                 sign=-1) * (sqrt_vol / N)               # [n1,n2,n3,2]

    # --- Cartesian G on the cube -------------------------------------------
    G_cart = jnp.einsum("ab,xyzb->xyza", B, st.Gred_cube)
    Gsq = jnp.sum(G_cart * G_cart, axis=-1)

    # --- Hartree -------------------------------------------------------------
    E_H = jnp.asarray(0.0, dtype=dt)
    if terms.hartree_scaling:
        coeffs = jnp.where(Gsq > 0,
                           4 * jnp.pi / jnp.where(Gsq > 0, Gsq, 1.0), 0.0)
        E_H = 0.5 * terms.hartree_scaling \
            * jnp.sum(coeffs * jnp.sum(rho_G * rho_G, axis=-1))

    # --- XC (+ NLCC core from the traced |G|) -------------------------------
    E_xc = jnp.asarray(0.0, dtype=dt)
    if terms.xc:
        rho_xc = rho
        if terms.rho_core_np is not None:
            Gsq_f = Gsq.reshape(-1)
            rcG = jnp.zeros((N, 2), dtype=dt)
            Gred_f = st.Gred_cube.reshape(-1, 3)
            done = {}
            for i, at in enumerate(model.atoms):
                if not getattr(at, "has_core_density", lambda: False)():
                    continue
                if at not in done:
                    done[at] = at.psp.core_density_fourier_sq(Gsq_f)
                ffc = done[at]
                pc, ps = phase_cos_sin(Gred_f, jnp.asarray(
                    model.positions[i], dtype=dt))
                rcG = rcG + jnp.stack([ffc * pc, -ffc * ps], -1)
            rcG = (rcG / sqrt_vol).reshape(fft_size + (2,))
            rho_core = jnp.maximum(dft3(rcG, sign=+1)[..., 0] / sqrt_vol, 0.0)
            rho_xc = rho + rho_core[None] / rho.shape[0]
        E_xc = xc_energy_split(terms.xc, rho_xc, G_cart, vol,
                               terms.xc_scaling)

    # --- AtomicLocal ---------------------------------------------------------
    E_loc = jnp.asarray(0.0, dtype=dt)
    Gsq_flat = Gsq.reshape(-1)
    rho_Gf = rho_G.reshape(-1, 2)
    gi = 0
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = el.local_potential_fourier_sq(Gsq_flat).astype(dt)
        sf = st.sf_loc[gi]
        gi += 1
        E_loc = E_loc + jnp.sum(ff * (rho_Gf[:, 0] * sf[:, 0]
                                      + rho_Gf[:, 1] * sf[:, 1])) / sqrt_vol

    E_nl = jnp.asarray(0.0, dtype=dt)
    if with_psi:
        E_nl = _nonlocal_energy_at_lattice(basis, st, xy, wocc, Gpk_cart,
                                           vol, sqrt_vol, dt)
    return E_kin + E_H + E_xc + E_loc + E_nl


def _nonlocal_energy_at_lattice(basis, st, xy, wocc, Gpk_cart, vol,
                                sqrt_vol, dt):
    """AtomicNonlocal energy with projectors traced through the metric."""
    model = basis.model
    terms = basis.terms
    E_nl = jnp.asarray(0.0, dtype=dt)
    if terms.has_nonlocal:
        Gpk_sq = jnp.sum(Gpk_cart * Gpk_cart, -1)
        Y = solid_harmonics_real(Gpk_cart, _max_l(model))
        hi = jax.lax.Precision.HIGHEST
        gi = 0
        for group in model.atom_groups:
            el = model.atoms[group[0]]
            if not (isinstance(el, ElementPsp) and el.psp.n_proj() > 0):
                continue
            psp = el.psp
            cols_re, cols_im = [], []
            D = np.zeros((psp.n_proj(), psp.n_proj()))
            col = 0
            for l in range(psp.lmax + 1):
                nproj_l = psp.n_proj_radial(l)
                if nproj_l == 0:
                    continue
                h = np.array(psp.h[l])
                rad = {i: psp.projector_fourier_sq(i, l, Gpk_sq).astype(dt)
                       for i in range(1, nproj_l + 1)}
                # (-i)^l phase: cycles (1, -i, -1, i)
                pre_re = [1.0, 0.0, -1.0, 0.0][l % 4]
                pre_im = [0.0, -1.0, 0.0, 1.0][l % 4]
                for m in range(-l, l + 1):
                    ylm = Y[..., LM_INDEX[(l, m)]].astype(dt)
                    for i in range(1, nproj_l + 1):
                        base = rad[i] * ylm
                        cols_re.append(pre_re * base)
                        cols_im.append(pre_im * base)
                        col += 1
                    D[col - nproj_l:col, col - nproj_l:col] = h
            ff_re = jnp.stack(cols_re, -1) * st.mask[:, :, None]
            ff_im = jnp.stack(cols_im, -1) * st.mask[:, :, None]
            Dj = jnp.asarray(D, dtype=dt)
            for sf in st.sf_nl[gi]:                     # per atom: [nk,nG,2]
                # conj(P) = conj(ff) conj(sf): (a,-b)(c,s->?)  with
                # sf = e^{-2 pi i G.r} = (c, -s') stored split; conj = negate im
                A_re = ff_re * sf[..., 0:1] - ff_im * sf[..., 1:2]
                A_im = -ff_im * sf[..., 0:1] - ff_re * sf[..., 1:2]
                Pd_re = (jnp.einsum("kgp,kng->knp", A_re, xy[..., 0],
                                    precision=hi)
                         - jnp.einsum("kgp,kng->knp", A_im, xy[..., 1],
                                      precision=hi))
                Pd_im = (jnp.einsum("kgp,kng->knp", A_re, xy[..., 1],
                                    precision=hi)
                         + jnp.einsum("kgp,kng->knp", A_im, xy[..., 0],
                                      precision=hi))
                band_e = (jnp.einsum("knp,pq,knq->kn", Pd_re, Dj, Pd_re,
                                     precision=hi)
                          + jnp.einsum("knp,pq,knq->kn", Pd_im, Dj, Pd_im,
                                       precision=hi))
                E_nl = E_nl + jnp.sum(wocc * band_e) / vol
            gi += 1
    return E_nl


def _max_l(model):
    return max((at.psp.lmax for g in model.atom_groups
                for at in [model.atoms[g[0]]] if isinstance(at, ElementPsp)),
               default=0)


def _host_stress_np(basis, eps_h=1e-6):
    """Ewald + PspCorrection stress contribution, f64 numpy central FD."""
    model = basis.model
    terms = basis.terms
    L0 = np.asarray(model.lattice, dtype=float)
    charges = np.array([at.charge_ionic() for at in model.atoms], dtype=float)
    pos = np.stack(model.positions)

    def E_host(L):
        E = 0.0
        if len(charges) > 0 and terms.E_ewald != 0.0:
            from .ewald import energy_ewald_np
            E += energy_ewald_np(L, charges, pos)
        if terms.E_psp_correction != 0.0:
            corr = sum(len(g) * model.atoms[g[0]].psp.energy_correction()
                       for g in model.atom_groups
                       if isinstance(model.atoms[g[0]], ElementPsp))
            E += corr * model.n_electrons / abs(np.linalg.det(L))
        return E

    grad = np.zeros((3, 3))
    for a in range(3):
        for b in range(a, 3):
            eps = np.zeros((3, 3))
            eps[a, b] = eps[b, a] = eps_h
            dE = E_host((np.eye(3) + eps) @ L0) \
                - E_host((np.eye(3) - eps) @ L0)
            g = dE / (2 * eps_h)
            # symmetric-strain derivative: off-diagonals get the full g
            grad[a, b] = grad[b, a] = g / (1 if a == b else 2)
    return grad


def compute_stresses_split(basis, sd, U, occupation, dtype=None):
    """Cartesian stress tensor (3x3, Ha/bohr^3) from split-SCF results.

    Two-part evaluation (like compute_forces_split): the band-heavy
    kinetic + nonlocal strain derivatives run on the device in the working
    dtype; the density-only terms (local/Hartree/XC) whose volume-scaled
    cube reductions dominate the f32 error (measured 8e-7 on the GaAs
    slab diagonals) are re-derived host-side in f64 on the CPU backend --
    they involve no band data, so the host part is O(cube), not O(bands).
    """
    model = basis.model
    dt = dtype or U.dtype
    st = prepare_stress_data(basis, dtype=dt)
    nG = sd.kin.shape[1]
    xy = jnp.stack([U[..., :nG], U[..., nG:]], axis=-1)
    wocc = st.kweights[:, None] * jnp.asarray(occupation, dtype=dt)
    L0 = np.asarray(model.lattice, dtype=float)
    vol = model.unit_cell_volume

    symmetrizer = make_symmetrizer_split(basis, dt)

    def f(st_, xy_, wocc_, eps):
        eps_sym = (eps + eps.T) / 2
        L = (jnp.eye(3, dtype=eps.dtype) + eps_sym) @ jnp.asarray(
            L0, dtype=eps.dtype)
        return energy_at_lattice_split(basis, st_, xy_, wocc_, L,
                                       symmetrizer=symmetrizer,
                                       include="psi")

    grad = jax.jit(jax.grad(f, argnums=3))(
        st, xy, wocc, jnp.zeros((3, 3), dtype=dt))
    stress = np.asarray(jax.device_get(grad), dtype=np.float64) / vol

    # ---- density terms: host f64 (CPU backend, x64 upgrade) ----------------
    cpu = jax.local_devices(backend="cpu")[0]
    xy_np = np.asarray(jax.device_get(xy), dtype=np.float64)
    wocc_np = np.asarray(jax.device_get(wocc), dtype=np.float64)
    with jax.enable_x64(True), jax.default_device(cpu):
        st64 = prepare_stress_data(basis, dtype=jnp.float64)
        symm64 = make_symmetrizer_split(basis, jnp.float64)

        def f_den(st_, xy_, wocc_, eps):
            eps_sym = (eps + eps.T) / 2
            L = (jnp.eye(3, dtype=eps.dtype) + eps_sym) @ jnp.asarray(
                L0, dtype=eps.dtype)
            return energy_at_lattice_split(basis, st_, xy_, wocc_, L,
                                           symmetrizer=symm64,
                                           include="density")

        grad64 = jax.jit(jax.grad(f_den, argnums=3))(
            st64, jnp.asarray(xy_np), jnp.asarray(wocc_np),
            jnp.zeros((3, 3), dtype=jnp.float64))
        stress = stress + np.asarray(jax.device_get(grad64),
                                     dtype=np.float64) / vol

    stress = (stress + stress.T) / 2
    stress = stress + _host_stress_np(basis) / vol
    from ..postprocess.stresses import symmetrize_stresses
    return symmetrize_stresses(basis, stress)
