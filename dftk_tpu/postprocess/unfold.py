"""Unfold an IBZ SCF result onto the full (reducible) Brillouin zone.

Counterpart of the reference's `unfold_bz` (DFTK `src/symmetry.jl:360-430`):
given an scfres computed on the irreducible wedge, rebuild the basis with
`use_symmetries_for_kpoint_reduction=False` and generate the Bloch orbitals
at every reducible k-point by applying the symmetry operations:

    phi(x) = psi_k(W x + w)  is a Bloch state at  k' = S k  (S = W^T) with
    c'_{S G + G0} = c_G * e^{2 pi i (G + k) . w},   G0 = k' - S k integer,

plus complex conjugation for k-points only reachable through time reversal
(k' = -S k).  Useful before interfacing codes that cannot exploit symmetry
(e.g. wannier90).
"""
import dataclasses
import math

import numpy as np

from ..symmetry import SYMMETRY_TOLERANCE


def _canon(k, tol=SYMMETRY_TOLERANCE):
    kk = np.asarray(k, float)
    kk = kk - np.round(kk)
    return tuple(np.round(kk / tol).astype(np.int64))


def unfold_bz(scfres):
    """Return a new SCFResult on the full reducible BZ (equal k-weights)."""
    from ..basis import PlaneWaveBasis

    basis = scfres.basis
    model = basis.model
    if basis.n_irreducible_kpoints == len(basis.kgrid.reducible_kcoords()):
        return scfres      # already unfolded

    new_basis = PlaneWaveBasis(
        model, Ecut=basis.Ecut, kgrid=basis.kgrid, fft_size=basis.fft_size,
        variational=basis.variational,
        symmetries_respect_rgrid=basis.symmetries_respect_rgrid,
        use_symmetries_for_kpoint_reduction=False)

    psi = np.asarray(scfres.psi)
    ev = np.asarray(scfres.eigenvalues)
    occ = np.asarray(scfres.occupation)
    nb = psi.shape[1]
    nk_irr = basis.n_irreducible_kpoints
    nk_red = new_basis.n_irreducible_kpoints
    nspin = model.n_spin_components

    psi_new = np.zeros((new_basis.n_kpoints, nb, new_basis.nG_max),
                       dtype=psi.dtype if np.iscomplexobj(psi)
                       else np.complex128)
    ev_new = np.zeros((new_basis.n_kpoints, nb))
    occ_new = np.zeros((new_basis.n_kpoints, nb))

    for ik_new in range(nk_red):
        k_red = new_basis.kcoords[ik_new]
        hit = None
        for op in model.symmetries:
            S = op.S
            for tr in (1, -1):
                # find irr k with  tr * S k_irr == k_red (mod 1)
                for ik_irr, k_irr in enumerate(basis.kcoords):
                    if _canon(tr * (S @ k_irr)) == _canon(k_red):
                        hit = (ik_irr, op, tr)
                        break
                if hit:
                    break
            if hit:
                break
        assert hit is not None, f"no symmetry maps any irr k to {k_red}"
        ik_irr, op, tr = hit
        S = op.S
        Sinv = np.round(np.linalg.inv(S)).astype(int)
        w = op.wvec
        k_irr = basis.kcoords[ik_irr]
        G0 = np.round(k_red - tr * (S @ k_irr)).astype(int)

        # map every sphere vector of the new k to a source sphere vector
        for ispin in range(nspin):
            ik_new_g = ik_new + ispin * nk_red
            ik_irr_g = ik_irr + ispin * nk_irr
            n_new = int(new_basis.nG_per_k[ik_new_g])
            Gnew = new_basis.Gred_np[ik_new_g, :n_new]          # [n,3]
            # momentum match: tr * S (G_src + k_irr) = G'' + k_red
            #   => G_src = tr * S^-1 (G'' + G0),  G0 = k_red - tr S k_irr
            Gsrc = (tr * (Gnew + G0)) @ Sinv.T
            src_index = {tuple(g): j for j, g in enumerate(
                basis.Gred_np[ik_irr_g, :int(basis.nG_per_k[ik_irr_g])])}
            idx = np.array([src_index[tuple(g)] for g in Gsrc], dtype=np.int64)
            phase = np.exp(2j * math.pi * ((Gsrc + k_irr) @ w))
            block = psi[ik_irr_g][:, idx] * phase[None, :]
            if tr == -1:
                block = np.conj(block)
            psi_new[ik_new_g, :, :n_new] = block
            ev_new[ik_new_g] = ev[ik_irr_g]
            occ_new[ik_new_g] = occ[ik_irr_g]

    return dataclasses.replace(
        scfres, basis=new_basis, psi=psi_new, eigenvalues=ev_new,
        occupation=occ_new)
