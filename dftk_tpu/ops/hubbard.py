"""DFT+U (rotationally invariant Dudarev form).

Mirrors DFTK `src/terms/hubbard.jl`: a Hubbard correction on a manifold of
pseudo-atomic orbitals (from the UPF pseudo-wavefunctions),

    E_U = sum_sigma U/2 Tr[ n^sigma (1 - n^sigma) ],
    n^sigma_{mm'} = sum_{kn in sigma} w_k f_kn <psi_kn|phi_m><phi_m'|psi_kn>

with the corresponding potential  V_U = sum_{mm'} U (1/2 delta - n)_{mm'}
|phi_m><phi_m'| applied like a nonlocal projector pair (one extra pair of
GEMMs in H psi).  The occupation matrix is built from the previous SCF
iterate (same strategy as the exchange operator).
"""
import dataclasses
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.special import LM_INDEX, solid_harmonics_real


@dataclasses.dataclass(frozen=True)
class HubbardManifold:
    atom_index: int
    l: int
    U: float            # Hubbard U (Hartree)
    i: int = 1          # which radial pswfc of that l (1-based)


def build_hubbard_projectors(basis, manifolds: Sequence[HubbardManifold]):
    """Phi [nk, nG, n_orb] atomic-orbital projectors (normalised per orbital).

    Ordering: manifolds in input order, m = -l..l within each.
    """
    model = basis.model
    sqrt_vol = math.sqrt(model.unit_cell_volume)
    Gpk = basis.Gpk_cart_np
    Gpk_norm = np.linalg.norm(Gpk, axis=-1)
    Gred_pk = basis.Gred_np.astype(float) + basis.kcoords_spin[:, None, :]

    cols = []
    slices = []
    for mf in manifolds:
        at = model.atoms[mf.atom_index]
        psp = at.psp
        if not hasattr(psp, "pswfc_fourier"):
            raise ValueError("Hubbard manifolds need pseudo-atomic orbitals "
                             "(UPF pseudopotentials)")
        rad = psp.pswfc_fourier(mf.i, mf.l, Gpk_norm)
        Y = solid_harmonics_real(Gpk, mf.l)
        sf = np.exp(-2j * math.pi
                    * (Gred_pk @ np.asarray(model.positions[mf.atom_index])))
        start = len(cols)
        for m in range(-mf.l, mf.l + 1):
            col = (sf * rad * (-1j) ** mf.l * Y[..., LM_INDEX[(mf.l, m)]]
                   / sqrt_vol) * basis.mask_np
            # normalise the projector on the discrete basis
            nrm = np.sqrt(np.sum(np.abs(col) ** 2, axis=1, keepdims=True))
            cols.append(col / np.maximum(nrm, 1e-300))
        slices.append((start, len(cols)))
    Phi = np.stack(cols, axis=-1)          # [nk, nG, n_orb]
    return jnp.asarray(Phi), slices


def occupation_matrix(Phi, psi, occupation, kweights, kspin, n_spin):
    """n^sigma_{mm'} [nspin, n_orb, n_orb] (Hermitian)."""
    proj = jnp.einsum("kgm,kng->knm", Phi.conj(), psi)     # <phi_m|psi>
    w = kweights[:, None] * occupation
    nk_mat = jnp.einsum("kn,knm,knp->kmp", w, proj, proj.conj())
    sel = jax.nn.one_hot(kspin, n_spin, dtype=nk_mat.real.dtype)
    n = jnp.einsum("ks,kmp->smp", sel, nk_mat)
    return (n + n.conj().swapaxes(1, 2)) / 2


def hubbard_energy(n, manifolds, slices, filled):
    """E_U = sum_sigma sum_manifolds U/2 Tr[n (1 - n)].

    For non-spin-polarised runs the occupations include the factor
    filled=2, so n is rescaled per spin channel (n -> n/filled * ... the
    reference treats each spin channel separately; with nspin=1 both
    channels are identical and carry n/2 each).
    """
    nspin = n.shape[0]
    scale = filled if nspin == 1 else 1.0
    E = 0.0
    for mf, (a, b) in zip(manifolds, slices):
        for s in range(nspin):
            ns = n[s, a:b, a:b] / scale
            tr = jnp.trace(ns - ns @ ns).real
            E = E + scale * mf.U / 2 * tr
    return E


def hubbard_potential_matrix(n, manifolds, slices, filled):
    """V_{mm'} [nspin, n_orb, n_orb]: U (1/2 delta - n)."""
    nspin = n.shape[0]
    scale = filled if nspin == 1 else 1.0
    V = jnp.zeros_like(n)
    for mf, (a, b) in zip(manifolds, slices):
        for s in range(nspin):
            ns = n[s, a:b, a:b] / scale
            block = mf.U * (0.5 * jnp.eye(b - a, dtype=n.dtype) - ns)
            V = V.at[s, a:b, a:b].set(block)
    return V


def apply_hubbard(Phi, Vmat, kspin, psi):
    """H psi += sum_{mm'} V_{mm'} |phi_m><phi_m'|psi."""
    proj = jnp.einsum("kgm,kng->knm", Phi.conj(), psi)
    Vk = Vmat[kspin]                                       # [nk, n_orb, n_orb]
    coeff = jnp.einsum("kmp,knp->knm", Vk, proj)
    return jnp.einsum("kgm,knm->kng", Phi, coeff)


# ---------------------------------------------------------------------------
# Symmetrization of the occupation matrix (reference terms/hubbard.jl:
# symmetrize_nhubbard; needed whenever the BZ is sampled on the irreducible
# wedge only, so that n_{mm'} regains the full site symmetry)
# ---------------------------------------------------------------------------

def real_sph_rotation(l, Wcart):
    """D[m', m] with  Y_m(W^-1 r) = sum_m' D[m', m] Y_m'(r).

    Built by sampling: exact for orthogonal Wcart since the real solid
    harmonics span an invariant subspace.
    """
    if l == 0:
        return np.ones((1, 1))
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(8 * (2 * l + 1), 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    Y = solid_harmonics_real(pts, l)[:, l * l:(l + 1) * (l + 1)]
    Yr = solid_harmonics_real(pts @ np.linalg.inv(Wcart).T,
                              l)[:, l * l:(l + 1) * (l + 1)]
    D, *_ = np.linalg.lstsq(Y, Yr, rcond=None)
    return D


def build_occupation_symmetrization(basis, manifolds, slices):
    """Per-manifold plan [(src_slice, D), ...] over all basis symmetries."""
    model = basis.model
    L = model.lattice
    Linv = np.linalg.inv(L)
    plan = [[] for _ in manifolds]
    for op in basis.symmetries:
        W, w = op.Wmat, op.wvec
        Wcart = L @ W @ Linv
        for fi, (mf, sl) in enumerate(zip(manifolds, slices)):
            # preimage atom j:  W pos_j + w == pos_I (mod 1)
            target = np.linalg.solve(W, np.asarray(
                model.positions[mf.atom_index], dtype=float) - w)
            src = None
            for mf2, sl2 in zip(manifolds, slices):
                if (mf2.l, mf2.i, mf2.U) != (mf.l, mf.i, mf.U):
                    continue
                d = np.asarray(model.positions[mf2.atom_index]) - target
                d -= np.round(d)
                if np.abs(d).max() < 1e-4:
                    src = sl2
                    break
            if src is None:
                raise ValueError(
                    "Hubbard manifold set is not closed under the crystal "
                    "symmetries; add the equivalent atoms or disable "
                    "symmetries")
            plan[fi].append((src, real_sph_rotation(mf.l, Wcart)))
    return plan


def symmetrize_occupation_matrix(n, slices, plan):
    """Average the per-manifold blocks of n over the symmetry plan."""
    out = n
    for (a, b), ops in zip(slices, plan):
        acc = 0.0
        for (a2, b2), D in ops:
            Dj = jnp.asarray(D, dtype=n.dtype)
            acc = acc + jnp.einsum("pm,spq,qr->smr", Dj.conj(),
                                   n[:, a2:b2, a2:b2], Dj)
        out = out.at[:, a:b, a:b].set(acc / len(ops))
    return out


# ---------------------------------------------------------------------------
# Split-engine (realified, complex-free) Hubbard path: the same physics on
# TPU backends without complex dtype support.  Orbitals/projectors live as
# realified rows [*, n, 2nG]; the occupation matrix as an (nr, ni) pair with
# nr symmetric and ni antisymmetric (Hermitian split).
# ---------------------------------------------------------------------------

def realify_projectors(Phi, dtype=None):
    """Complex Phi [nk, nG, n_orb] -> realified rows [nk, n_orb, 2nG]."""
    z = np.moveaxis(np.asarray(Phi), -1, 1)
    out = np.concatenate([z.real, z.imag], axis=-1)
    return jnp.asarray(out, dtype=dtype)


def occupation_matrix_split(Phi_r, U, occupation, kweights, kspin, n_spin):
    """(nr, ni) [nspin, n_orb, n_orb] from realified bands (csplit repr:
    occupation is the physical f per row)."""
    from .eigen.csplit import cgram
    Pr, Pi = cgram(Phi_r, U)                       # <phi_m|psi_n> [nk,no,nb]
    w = kweights[:, None] * occupation             # [nk, nb]
    nr_k = jnp.einsum("kn,kmn,kpn->kmp", w, Pr, Pr) \
        + jnp.einsum("kn,kmn,kpn->kmp", w, Pi, Pi)
    ni_k = jnp.einsum("kn,kmn,kpn->kmp", w, Pi, Pr) \
        - jnp.einsum("kn,kmn,kpn->kmp", w, Pr, Pi)
    sel = jax.nn.one_hot(kspin, n_spin, dtype=nr_k.dtype)
    nr = jnp.einsum("ks,kmp->smp", sel, nr_k)
    ni = jnp.einsum("ks,kmp->smp", sel, ni_k)
    return ((nr + nr.transpose(0, 2, 1)) / 2,
            (ni - ni.transpose(0, 2, 1)) / 2)


def hubbard_energy_split(nr, ni, manifolds, slices, filled):
    """E_U = sum U/2 Tr[n(1-n)] on the Hermitian split pair: Tr[n] = Tr[nr],
    Tr[n^2] = Tr[nr nr] - Tr[ni ni] (ni antisymmetric)."""
    nspin = nr.shape[0]
    scale = filled if nspin == 1 else 1.0
    E = 0.0
    for mf, (a, b) in zip(manifolds, slices):
        for s in range(nspin):
            ar = nr[s, a:b, a:b] / scale
            ai = ni[s, a:b, a:b] / scale
            tr = jnp.trace(ar) - (jnp.sum(ar * ar.T) - jnp.sum(ai * ai.T))
            E = E + scale * mf.U / 2 * tr
    return E


def hubbard_potential_matrix_split(nr, ni, manifolds, slices, filled):
    """(Vr, Vi): U (1/2 delta - n) blockwise on the split pair."""
    nspin = nr.shape[0]
    scale = filled if nspin == 1 else 1.0
    Vr = jnp.zeros_like(nr)
    Vi = jnp.zeros_like(ni)
    for mf, (a, b) in zip(manifolds, slices):
        for s in range(nspin):
            eye = jnp.eye(b - a, dtype=nr.dtype)
            Vr = Vr.at[s, a:b, a:b].set(mf.U * (0.5 * eye
                                                - nr[s, a:b, a:b] / scale))
            Vi = Vi.at[s, a:b, a:b].set(-mf.U * ni[s, a:b, a:b] / scale)
    return Vr, Vi


def apply_hubbard_split(Phi_r, Vr, Vi, kspin, U):
    """H psi += sum_{mm'} V_{mm'} |phi_m><phi_m'|psi on realified bands."""
    from .eigen.csplit import cgram, cmatsmall, crotate
    Pr, Pi = cgram(Phi_r, U)                       # <phi_m|psi_n> [nk,no,nb]
    Vkr, Vki = Vr[kspin], Vi[kspin]                # [nk, no, no]
    Cr, Ci = cmatsmall(Vkr, Vki, Pr, Pi)           # C = V @ P
    return crotate(Cr, Ci, Phi_r)


def symmetrize_occupation_matrix_split(nr, ni, slices, plan):
    """Symmetry-average the split pair; the rotation matrices D are real
    (real spherical harmonics), so both parts transform independently."""
    out_r, out_i = nr, ni
    for (a, b), ops in zip(slices, plan):
        acc_r, acc_i = 0.0, 0.0
        for (a2, b2), D in ops:
            Dj = jnp.asarray(D, dtype=nr.dtype)
            acc_r = acc_r + jnp.einsum("pm,spq,qr->smr", Dj,
                                       nr[:, a2:b2, a2:b2], Dj)
            acc_i = acc_i + jnp.einsum("pm,spq,qr->smr", Dj,
                                       ni[:, a2:b2, a2:b2], Dj)
        out_r = out_r.at[:, a:b, a:b].set(acc_r / len(ops))
        out_i = out_i.at[:, a:b, a:b].set(acc_i / len(ops))
    return out_r, out_i
