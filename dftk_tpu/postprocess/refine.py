"""Post-SCF refinement on a finer basis (two-grid scheme).

Counterpart of DFTK `src/postprocess/refine.jl` (Cances/Dusson/Kemlin/
Levitt 2022, CDKL2022): after converging on a coarse Ecut, transfer to a
larger Ecut basis and compute the first-order correction delta_psi by the
Schur-complement split of (Omega + K) (reference refine.jl:116-168):

  * high frequencies (outside the coarse basis): one TPA-metric solve
      e2 = M^{-1} res_HF,   M_n = tpa_shift * mean_kin[n] + kin
  * low frequencies (the coarse space): a full (Omega+K) solve
      (Omega+K) e1 = res_LF - [(Omega+K) e2]_LF
    using the same CG solver the Newton SCF and elastic response use.

delta_psi = e1 + e2 and delta_rho then refine energies and FORCES:
refine_forces is the directional derivative of the AD force functional
along (delta_psi, delta_rho) (reference refine.jl:190-203, the
examples/error_estimates_forces.jl flow).
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


class RefinementResult:
    """psi/rho and their first-order corrections on the fine basis.

    Mirrors the reference RefinementResult (refine.jl:95-105): the refined
    quantities are psi + dpsi and rho + drho.
    """
    pass


def refine_scfres(scfres, Ecut_fine, tpa_shift=1.0, cg_tol=1e-8,
                  cg_maxiter=200):
    """Refine a converged scfres on a finer basis (insulators).

    tpa_shift scales the per-band mean-kinetic shift of the TPA refinement
    metric M_n = tpa_shift * <psi_n|T|psi_n> + kin used on the
    high-frequency complement (reference invert_refinement_metric,
    refine.jl:43-85; 1.0 = the reference metric).
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
    res = -R                                     # reference refine.jl:136

    # frequency split of the residual across the two bases
    res_LF_c = transfer_blochwave(res, fine, basis)      # coarse coeffs
    res_LF = transfer_blochwave(res_LF_c, basis, fine)
    res_HF = res - res_LF

    # ---- high frequencies: TPA metric solve (refine.jl:43-85) -------------
    kin = td.kinetic_scale * bd.kin                       # [nk, nG]
    mean_kin = jnp.einsum("kng,kg,kng->kn", psi.conj(), kin, psi).real
    denom = jnp.maximum(tpa_shift * mean_kin[:, :, None] + kin[:, None, :],
                        1e-3)
    e2 = (res_HF / denom) * bd.mask[:, None, :]
    ov = jnp.einsum("kng,kmg->knm", psi.conj(), e2)
    e2 = e2 - jnp.einsum("knm,kng->kmg", ov, psi)

    # ---- low frequencies: (Omega+K) solve on the coarse space -------------
    from ..response.hessian import make_omega_plus_k, solve_omega_plus_k
    OmegaK_fine, _, _ = make_omega_plus_k(fine, psi, occ, rho=rho)
    OpKe2_c = transfer_blochwave(OmegaK_fine(e2), fine, basis)
    rhs = OpKe2_c - res_LF_c
    # solve_omega_plus_k solves (Omega+K) x = -P_c rhs, the reference
    # solve_OmegaplusK convention (refine.jl:158)
    e1_c = solve_omega_plus_k(basis, psi_c, occ, rhs, cg_tol=cg_tol,
                              cg_maxiter=cg_maxiter)
    e1 = transfer_blochwave(e1_c, basis, fine)

    dpsi = (e1 + e2) * bd.mask[:, None, :]

    # first-order density correction (refine.jl:170)
    _, drho = jax.jvp(
        lambda p: compute_density(bd, p, occ, fine.fft_size, vol,
                                  model.n_spin_components,
                                  symmetrizer=symmetrizer),
        (psi,), (dpsi,))

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

    out = RefinementResult()
    out.basis = fine
    out.psi = psi_ref
    out.rho = rho_ref
    out.psi0 = psi                       # transferred, unrefined
    out.dpsi = dpsi
    out.rho0 = rho
    out.drho = drho
    out.occupation = np.asarray(occ)
    out.energies = energies_out
    out.total_energy = energies_out["total"]
    out.residual_norm = float(jnp.linalg.norm(R))
    return out


def refine_forces(refinement):
    """First-order force correction from the refinement (refine.jl:190-203).

    Returns dict with F (forces at the transferred state), dF (directional
    derivative of the force functional along (dpsi, drho)), and
    F_refined = F + dF - all in reduced coordinates [n_atoms, 3].
    The derivative is a jax.jvp through the AD force functional
    (forward-over-reverse), where the reference threads a ForwardDiff
    epsilon through compute_forces.
    """
    from .forces import _positions_energy
    fine = refinement.basis
    occ = jnp.asarray(refinement.occupation)
    positions = jnp.asarray(np.stack(fine.model.positions))

    def force_fn(psi, rho):
        g = jax.grad(lambda pos: _positions_energy(
            fine, psi, occ, rho, pos))(positions)
        return -g

    F, dF = jax.jvp(force_fn,
                    (refinement.psi0, refinement.rho0),
                    (refinement.dpsi, refinement.drho))
    F = np.asarray(jax.device_get(F))
    dF = np.asarray(jax.device_get(dF))
    if fine.terms.pairwise_forces is not None:
        F = F + fine.terms.pairwise_forces
    return {"F": F, "dF": dF, "F_refined": F + dF}


def refine_forces_cart(refinement):
    """Cartesian refined forces (symmetrized), [n_atoms, 3]."""
    from .forces import symmetrize_forces
    model = refinement.basis.model
    res = refine_forces(refinement)
    inv_lat = np.linalg.inv(model.lattice)
    out = {}
    for key, f in res.items():
        out[key] = symmetrize_forces(refinement.basis, f) @ inv_lat
    return out
