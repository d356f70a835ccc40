"""Newton SCF: solve (Omega + K) delta_psi = -residual (insulators).

Mirrors DFTK `src/scf/newton.jl` + `response/hessian.jl:31-115`:
  * residual   r_n = P_c H psi_n             (P_c = 1 - psi psi^dag)
  * Omega dpsi = P_c (H - eps_n) P_c dpsi
  * K dpsi     = P_c [ K_Hxc(drho[dpsi]) psi ]_n,
    drho = 2 sum_n f_n Re(psi_n^* dpsi_n)
with the Hessian solve by (non-symmetric-safe) preconditioned CG on the
combined operator; K_Hxc applied exactly via jax.jvp through the potential
assembly.  Quadratic convergence near the minimum; insulators only.
"""
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fft as fftops
from ..ops import hamiltonian as hamops
from ..ops.density import compute_density, guess_density, make_symmetrizer
from ..ops.eigen.lobpcg import lobpcg, ortho_qr
from .driver import SCFResult, random_orbitals


def newton(basis, tol=1e-10, maxiter=20, cg_tol_ratio=1e-3, cg_maxiter=100,
           psi=None, scf_start_iters=2, callback=None, seed=42) -> SCFResult:
    """Newton iteration on the orbitals for insulating systems."""
    t0 = time.time()
    model = basis.model
    terms = basis.terms
    if model.temperature > 0:
        raise ValueError("newton supports insulators only (like the reference)")
    nspin = model.n_spin_components
    filled = model.filled_occupation
    n_occ = model.n_electrons // filled
    bd, td = basis.data, terms.data
    fft_size, volume = basis.fft_size, model.unit_cell_volume
    Gcart = jnp.asarray(basis.G_cube_cart)
    occ = jnp.full((basis.n_kpoints, n_occ), float(filled))
    # same symmetrized-density functional as the SCF driver: on a reduced
    # k-grid the unsymmetrized E[rho(psi)] is a DIFFERENT functional with a
    # different minimizer (symmetrization = positivity-preserving linear
    # orbit average, so jax.jvp/grad through it are exact)
    symmetrizer = make_symmetrizer(basis)

    # ---- warm start: a couple of cheap SCF steps -----------------------------
    if psi is None:
        from .driver import self_consistent_field
        res0 = self_consistent_field(basis, tol=1e-2, maxiter=scf_start_iters,
                                     n_bands=n_occ, n_extra_bands=2, seed=seed)
        psi = res0.psi[:, :n_occ]
    psi = ortho_qr(psi)

    def density_of(psi):
        return compute_density(bd, psi, occ, fft_size, volume, nspin,
                               symmetrizer=symmetrizer)

    def ham_of(rho):
        V, energies = hamops.total_potential(terms, rho, Gcart, volume)
        return hamops.build_ham(bd, td, V), energies

    def dV_times_psi(dV, psi):
        cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
            c, i, m, fft_size))(psi, bd.Gidx, bd.mask)
        psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
        out = jnp.fft.fftn(dV[bd.kspin][:, None] * psir, axes=(-3, -2, -1))
        return jax.vmap(fftops.gather_from_cube)(out, bd.Gidx, bd.mask)

    @jax.jit
    def newton_rhs(psi):
        rho = density_of(psi)
        ham, energies = ham_of(rho)
        hpsi = hamops.apply_H(ham, psi, fft_size, volume)
        lam = jnp.einsum("kng,kmg->knm", psi.conj(), hpsi)
        r = hpsi - jnp.einsum("knm,kng->kmg", lam, psi)     # P_c H psi
        energies.update(hamops.psi_energies(ham, terms, psi, occ, bd.kweights))
        E = sum(energies.values()) + terms.E_ewald + terms.E_psp_correction
        return r, rho, ham, lam, E, energies

    def make_hessian(psi, rho, ham, lam):
        eps_n = jnp.real(jnp.einsum("knn->kn", lam))

        def Pc(x):
            ov = jnp.einsum("kng,kmg->knm", psi.conj(), x)
            return x - jnp.einsum("knm,kng->kmg", ov, psi)

        def Kpart(dpsi):
            # drho = 2 sum f w Re(psi* dpsi) -> dV via exact kernel jvp
            def rho_of(p):
                return compute_density(bd, p, occ, fft_size, volume, nspin,
                                       symmetrizer=symmetrizer)
            _, drho = jax.jvp(rho_of, (psi,), (dpsi,))

            def pot(r):
                V, _ = hamops.total_potential(terms, r, Gcart, volume)
                return V
            _, dV = jax.jvp(pot, (rho,), (drho,))
            return Pc(dV_times_psi(dV, psi))

        def Omega(dpsi):
            h = hamops.apply_H(ham, dpsi, fft_size, volume)
            return Pc(h - eps_n[:, :, None].astype(dpsi.dtype) * dpsi)

        return lambda dpsi: Omega(Pc(dpsi)) + Kpart(Pc(dpsi))

    kin = td.kinetic_scale * bd.kin

    @jax.jit
    def cg_solve(psi, rho, ham, lam, b, cg_tol):
        A = make_hessian(psi, rho, ham, lam)
        mean_kin = jnp.maximum(
            jnp.einsum("kng,kg,kng->kn", psi.conj(), kin, psi).real, 1e-12)

        def M(x):
            return x * (mean_kin[:, :, None]
                        / (mean_kin[:, :, None] + kin[:, None, :] + 1e-20))

        x = jnp.zeros_like(b)
        r = b
        z = M(r)
        p = r * 0 + z
        rz = jnp.vdot(r, z).real

        def body(state):
            x, r, z, p, rz, it = state
            Ap = A(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap).real, 1e-300)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.vdot(r, z).real
            p = z + (rz_new / jnp.maximum(rz, 1e-300)) * p
            return x, r, z, p, rz_new, it + 1

        def cond(state):
            return jnp.logical_and(state[5] < cg_maxiter,
                                   jnp.linalg.norm(state[1]) > cg_tol)

        x, r, *_ = jax.lax.while_loop(cond, body, (x, r, z, p, rz,
                                                   jnp.asarray(0)))
        return x

    E_prev, converged, info = None, False, None
    for it in range(maxiter):
        r, rho, ham, lam, E, energies = newton_rhs(psi)
        rnorm = float(jnp.linalg.norm(r))
        E = float(E)
        if callback:
            callback(dict(n_iter=it + 1, E=E, rnorm=rnorm))
        info = (rho, lam, energies, E)
        if E_prev is not None and abs(E - E_prev) < tol and rnorm < 1e-6:
            converged = True
            break
        E_prev = E
        dpsi = cg_solve(psi, rho, ham, lam, -r,
                        jnp.asarray(max(cg_tol_ratio * rnorm, 1e-12)))
        psi = ortho_qr((psi + dpsi) * bd.mask[:, None, :])

    rho, lam, energies, E = info
    w, Y = jnp.linalg.eigh((lam + lam.conj().swapaxes(1, 2)) / 2)
    psi = jnp.einsum("knm,kng->kmg", Y, psi)
    energies_out = {k: float(jax.device_get(v)) for k, v in energies.items()}
    energies_out["Ewald"] = terms.E_ewald
    energies_out["PspCorrection"] = terms.E_psp_correction
    energies_out["total"] = float(sum(energies_out.values()))
    eigenvalues = np.asarray(jax.device_get(w))
    return SCFResult(
        basis=basis, energies=energies_out, eigenvalues=eigenvalues,
        occupation=np.asarray(jax.device_get(occ)), psi=psi, rho=rho,
        epsF=float(np.max(eigenvalues)), converged=bool(converged),
        n_iter=it + 1, n_bands_converge=n_occ, history_Etot=[],
        history_Drho=[], n_matvec=0, runtime_s=time.time() - t0)
