"""Direct minimization of the Kohn-Sham energy over orbitals.

Alternative ground-state solver for insulators (DFTK
`src/scf/direct_minimization.jl` uses Optim LBFGS on the Stiefel manifold;
here: Riemannian preconditioned gradient descent with momentum and
orthonormalisation retraction, entirely jitted).  The total energy is one
differentiable function of the orbitals - jax.grad supplies H psi f w
automatically, so any future term works without solver changes.
"""
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamiltonian as hamops
from ..ops.density import compute_density, guess_density, make_symmetrizer
from ..ops.eigen.lobpcg import ortho_qr
from .driver import SCFResult, random_orbitals


def energy_from_orbitals(basis, psi, occupation, symmetrizer=None):
    """Total energy (without entropy) as a function of orthonormal psi."""
    model = basis.model
    terms = basis.terms
    Gcart = jnp.asarray(basis.G_cube_cart)
    rho = compute_density(basis.data, psi, occupation, basis.fft_size,
                          model.unit_cell_volume, model.n_spin_components,
                          symmetrizer=symmetrizer)
    V, energies = hamops.total_potential(terms, rho, Gcart,
                                         model.unit_cell_volume)
    ham = hamops.build_ham(basis.data, terms.data, V)
    energies.update(hamops.psi_energies(ham, terms, psi, occupation,
                                        basis.data.kweights))
    if terms.anyonic is not None:
        # pure energy functional of psi: jax.grad of it reproduces the
        # reference's hand-derived current-response operator automatically
        # (ops/anyonic.py docstring; validated in tests/test_anyonic.py)
        from ..ops.anyonic import anyonic_energy
        hbar, beta, rho_ref, Aref = terms.anyonic
        energies["Anyonic"] = anyonic_energy(
            basis.data, psi, occupation, jnp.sum(rho, axis=0),
            jnp.asarray(rho_ref), jnp.asarray(Aref), Gcart, hbar, beta,
            basis.fft_size, model.unit_cell_volume)
    E = sum(energies.values()) + terms.E_ewald + terms.E_psp_correction
    return E, rho


def direct_minimization(basis, tol=1e-8, maxiter=300, psi=None,
                        n_bands: Optional[int] = None, step: float = 1.0,
                        momentum: float = 0.7, seed: int = 42,
                        callback=None) -> SCFResult:
    """Minimize E[psi] at fixed integer occupations (insulators only)."""
    import time
    t0 = time.time()
    model = basis.model
    if model.temperature > 0:
        raise ValueError("direct_minimization supports insulators only "
                         "(zero temperature), like the reference")
    filled = model.filled_occupation
    n_occ = model.n_electrons // filled
    if n_bands is None:
        n_bands = n_occ
    if psi is None:
        # warm start: diagonalize H at the guess density once (puts us in
        # the quadratic basin; random orbitals make gradient descent unstable)
        from ..ops.eigen.lobpcg import lobpcg
        rho0 = guess_density(basis)
        Gcart0 = jnp.asarray(basis.G_cube_cart)
        V0, _ = hamops.total_potential(basis.terms, rho0, Gcart0,
                                       basis.model.unit_cell_volume)
        ham0 = hamops.build_ham(basis.data, basis.terms.data, V0)
        res0 = lobpcg(lambda p: hamops.apply_H(ham0, p, basis.fft_size,
                                               basis.model.unit_cell_volume),
                      random_orbitals(basis, n_bands, seed=seed),
                      ham0.kin, basis.data.mask, tol=1e-4, maxiter=60)
        psi = res0.X
    occ = jnp.full((basis.n_kpoints, n_bands), float(filled))

    bd = basis.data
    kin = basis.terms.kinetic_scale * bd.kin
    # Minimize the SAME symmetrized-density functional as the SCF driver:
    # with a symmetry-reduced k-grid, E[rho(psi)] without symmetrization is
    # a DIFFERENT functional whose minimizer is ~|drho| = 0.3 away on
    # silicon (2,2,2).  Symmetrization is the linear, positivity-preserving
    # orbit average (density.py:make_symmetrizer), so jax.grad through it
    # is exact and the functional stays variational (reference
    # direct_minimization works on symmetric bases the same way).
    symmetrizer = make_symmetrizer(basis)

    def energy(psi):
        E, _ = energy_from_orbitals(basis, psi, occ, symmetrizer)
        return E

    egrad = jax.value_and_grad(energy)

    wocc = bd.kweights[:, None] * occ   # the gradient carries these weights

    @jax.jit
    def opt_step(psi, vel, tau):
        E, g = egrad(psi)
        g = g.conj()       # Wirtinger: descent direction for complex psi
        # natural gradient: divide out the k-weight * occupation factor so
        # every band sees the same effective step (g = 2 w f H psi ...)
        g = g / (2 * wocc[:, :, None])
        # project to the tangent space of the orthonormality manifold
        ov = jnp.einsum("kng,kmg->knm", psi.conj(), g)
        g = g - jnp.einsum("knm,kng->kmg", (ov + ov.conj().swapaxes(1, 2)) / 2,
                           psi)
        # TPA preconditioning
        mean_kin = jnp.maximum(
            jnp.einsum("kng,kg,kng->kn", psi.conj(), kin, psi).real, 1e-12)
        pg = g * (mean_kin[:, :, None] / (mean_kin[:, :, None]
                                          + kin[:, None, :] + 1e-20))
        vel = momentum * vel - tau * pg
        psi_new = ortho_qr((psi + vel) * bd.mask[:, None, :])
        O = jnp.einsum("kng,kmg->knm", psi_new.conj(), psi_new)
        ortho_err = jnp.max(jnp.abs(O - jnp.eye(O.shape[-1], dtype=O.dtype)))
        gnorm = jnp.linalg.norm(g)
        return psi_new, vel, E, gnorm, ortho_err

    energy_jit = jax.jit(energy)
    vel = jnp.zeros_like(psi)
    E_prev, converged = None, False
    tau = step
    E_cur = float(energy_jit(psi))
    for it in range(maxiter):
        psi_new, vel_new, E, gnorm, oerr = opt_step(psi, vel, tau)
        E_new = float(energy_jit(psi_new))
        # Armijo backtracking; a retraction that lost orthonormality (rank
        # collapse) or a NaN/increased energy are equally invalid
        def bad(e, oe):
            return (not math.isfinite(e) or e > E_cur + 1e-14
                    or float(oe) > 1e-8)
        n_bt = 0
        while bad(E_new, oerr) and n_bt < 12:
            tau = tau / 2
            vel = jnp.zeros_like(vel)
            psi_new, vel_new, _, gnorm, oerr = opt_step(psi, vel, tau)
            E_new = float(energy_jit(psi_new))
            n_bt += 1
        if bad(E_new, oerr):
            converged = abs(E_cur - (E_prev if E_prev is not None else 0)) < tol
            break     # cannot make progress; return the last good iterate
        if n_bt == 0:
            tau = min(tau * 1.2, step)
        psi, vel = psi_new, vel_new
        E_prev, E_cur = E_cur, E_new
        if callback:
            callback(dict(n_iter=it + 1, E=E_cur, gnorm=float(gnorm)))
        if abs(E_cur - E_prev) < tol and float(gnorm) < 1e-3:
            converged = True
            break

    # final diagnostics: Rayleigh-Ritz in the converged subspace
    model = basis.model
    Gcart = jnp.asarray(basis.G_cube_cart)
    _, rho = energy_from_orbitals(basis, psi, occ, symmetrizer)
    V, energies = hamops.total_potential(basis.terms, rho, Gcart,
                                         model.unit_cell_volume)
    ham = hamops.build_ham(bd, basis.terms.data, V)
    hpsi = hamops.apply_H(ham, psi, basis.fft_size, model.unit_cell_volume)
    hsub = jnp.einsum("kng,kmg->knm", psi.conj(), hpsi)
    w, Y = jnp.linalg.eigh((hsub + hsub.conj().swapaxes(1, 2)) / 2)
    psi = jnp.einsum("knm,kng->kmg", Y, psi)
    energies.update(hamops.psi_energies(ham, basis.terms, psi, occ,
                                        bd.kweights))
    if basis.terms.anyonic is not None:
        from ..ops.anyonic import anyonic_energy
        hbar_a, beta_a, rho_ref_a, Aref_a = basis.terms.anyonic
        energies["Anyonic"] = anyonic_energy(
            bd, psi, occ, jnp.sum(rho, axis=0), jnp.asarray(rho_ref_a),
            jnp.asarray(Aref_a), Gcart, hbar_a, beta_a, basis.fft_size,
            model.unit_cell_volume)
    energies_out = {k: float(v) for k, v in energies.items()}
    energies_out["Ewald"] = basis.terms.E_ewald
    energies_out["PspCorrection"] = basis.terms.E_psp_correction
    energies_out["total"] = float(sum(energies_out.values()))

    eigenvalues = np.asarray(jax.device_get(w))
    epsF = float(np.max(eigenvalues[:, :n_occ]))
    return SCFResult(
        basis=basis, energies=energies_out, eigenvalues=eigenvalues,
        occupation=np.asarray(jax.device_get(occ)), psi=psi, rho=rho,
        epsF=epsF, converged=bool(converged), n_iter=it + 1,
        n_bands_converge=n_bands, history_Etot=[], history_Drho=[],
        n_matvec=0, runtime_s=time.time() - t0, V_local=V)
