"""Self-consistent response: solve the Dyson equation (1 - chi_0 K) drho = b.

Mirrors DFTK `src/response/hessian.jl:266-361` (solve_OmegaplusK_split):
the self-consistent density response to an external perturbation dV_ext is

    drho = chi_0 (dV_ext + K drho)      =>     (1 - chi_0 K) drho = chi_0 dV_ext

with K = Hartree + XC kernel.  K drho is evaluated by jax.jvp through
`total_potential` (exact kernel application, no hand-derived fxc), and the
linear system is solved with GMRES; works for metals through the
occupation-response terms in apply_chi0.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamiltonian as hamops
from .chi0 import Chi0Context, apply_chi0, make_chi0_context


def apply_kernel(basis, rho0, drho):
    """K drho = d(V_H + V_xc)/d rho . drho via jvp (terms/Hamiltonian.jl:127)."""
    model = basis.model
    terms = basis.terms
    Gcart = jnp.asarray(basis.G_cube_cart)

    def pot(r):
        V, _ = hamops.total_potential(terms, r, Gcart, model.unit_cell_volume)
        return V

    _, dV = jax.jvp(pot, (rho0,), (drho,))
    return dV


def solve_dyson(scfres, dV_ext, basis=None, tol=1e-7, maxiter=60,
                sternheimer_tol=1e-10, verbose=False, inexact=False):
    """Self-consistent drho for an external potential perturbation.

    dV_ext: [nspin, n1,n2,n3].  Returns (drho, dV_total).
    inexact=True relaxes the Sternheimer tolerance per GMRES iteration
    (the reference's inexact_gmres strategy) - cheaper, same answer to tol.
    """
    basis = basis or scfres.basis
    ctx = make_chi0_context(scfres, basis)
    rho0 = jnp.asarray(scfres.rho)

    # tol enters the Sternheimer while_loop as a traced scalar, so varying
    # it between calls does NOT retrigger compilation
    chi0_f = jax.jit(lambda dv, t: apply_chi0(ctx, basis, dv, tol=t))
    kernel_f = jax.jit(lambda dr: apply_kernel(basis, rho0, dr))

    b = chi0_f(dV_ext, jnp.asarray(sternheimer_tol))

    def matvec(drho, mtol=sternheimer_tol):
        return drho - chi0_f(kernel_f(drho), jnp.asarray(mtol))

    drho = gmres(matvec, b, tol=tol, maxiter=maxiter, verbose=verbose,
                 inexact=inexact)
    dV_tot = dV_ext + kernel_f(drho)
    return drho, dV_tot


def gmres(matvec, b, tol=1e-7, maxiter=60, restart=30, verbose=False,
          inexact=False, matvec_tol_bounds=(1e-12, 1e-5), safety=0.1):
    """Restarted GMRES with a host-side Arnoldi loop (device matvecs).

    inexact=True implements the reference's inexact-GMRES strategy
    (response/inexact_gmres.jl, after Simoncini-Szyld): the per-matvec
    (Sternheimer) tolerance is RELAXED as the outer residual shrinks,
    eta_j ~ safety * tol / rel_resid_j - early matvecs are tight, later
    ones cheap.  With inexact=True, matvec must accept (v, tol).
    Each matvec is expensive (a full Sternheimer sweep) while the Krylov
    bookkeeping is tiny, so a plain host loop over jitted matvecs is ideal.
    """
    shape = b.shape
    bflat = np.asarray(jax.device_get(b)).reshape(-1)
    bnorm = np.linalg.norm(bflat)
    if bnorm == 0:
        return jnp.zeros_like(b)

    rel_resid_cur = [1.0]

    def mv(v):
        if inexact:
            lo, hi = matvec_tol_bounds
            eta = float(np.clip(safety * tol / max(rel_resid_cur[0], tol),
                                lo, hi))
            return matvec(v, eta)
        return matvec(v)

    x = np.zeros_like(bflat)
    n_matvec = 0
    while n_matvec < maxiter:
        r = bflat - np.asarray(jax.device_get(
            mv(jnp.asarray(x.reshape(shape))))).reshape(-1)
        n_matvec += 1
        beta = np.linalg.norm(r)
        if beta / bnorm < tol:
            break
        rel_resid_cur[0] = beta / bnorm
        m = min(restart, maxiter - n_matvec)
        Q = [r / beta]
        H = np.zeros((m + 1, m), dtype=bflat.dtype)
        for j in range(m):
            w = np.asarray(jax.device_get(
                mv(jnp.asarray(Q[j].reshape(shape))))).reshape(-1)
            n_matvec += 1
            for i in range(j + 1):
                H[i, j] = np.vdot(Q[i], w)
                w = w - H[i, j] * Q[i]
            H[j + 1, j] = np.linalg.norm(w)
            # solve the least-squares problem for the current subspace
            e1 = np.zeros(j + 2, dtype=bflat.dtype)
            e1[0] = beta
            y, *_ = np.linalg.lstsq(H[:j + 2, :j + 1], e1, rcond=None)
            resid = np.linalg.norm(H[:j + 2, :j + 1] @ y - e1)
            rel_resid_cur[0] = resid / bnorm
            if verbose:
                print(f"  gmres it {n_matvec}: rel resid {resid / bnorm:.2e}")
            if resid / bnorm < tol or H[j + 1, j] < 1e-14:
                x = x + np.stack(Q[:j + 1], axis=1) @ y
                break
            Q.append(w / H[j + 1, j])
        else:
            x = x + np.stack(Q[:m], axis=1) @ y
            continue
        if resid / bnorm < tol:
            break
    return jnp.asarray(x.reshape(shape))


def compute_polarizability(scfres, direction=2, basis=None, **kwargs):
    """Dipole polarizability alpha = d mu / d E for a molecule in a box.

    Applies dV_ext = -E . r (sawtooth-free: requires a decoupled molecule in
    a large cell, like the reference's polarizability example) and returns
    the self-consistent  alpha = integral r drho / E.
    """
    basis = basis or scfres.basis
    model = basis.model
    nspin = model.n_spin_components
    # r_alpha relative to the cell center, Cartesian
    r_cart = np.einsum("ab,xyzb->xyza", model.lattice, basis.r_cube)
    center = model.lattice @ np.array([0.5, 0.5, 0.5])
    ra = r_cart[..., direction] - center[direction]
    dV = jnp.asarray(np.broadcast_to(ra, (nspin,) + basis.fft_size))
    drho, _ = solve_dyson(scfres, -dV, basis=basis, **kwargs)
    # dipole response along the same axis
    return float(jnp.sum(jnp.asarray(ra) * jnp.sum(drho, axis=0))
                 * basis.dvol)


def make_omega_plus_k(basis, psi, occupation, rho=None, include_K=True):
    """(OmegaK, Pc, M): the SCF Jacobian on the tangent space at psi, the
    occupied-space projector and the TPA preconditioner (reference
    src/response/hessian.jl apply_Omega/apply_K).  include_K=False gives
    the bare Omega (H - eps_n on the unoccupied space)."""
    model = basis.model
    terms = basis.terms
    bd = basis.data
    fft_size = basis.fft_size
    vol = model.unit_cell_volume
    nspin = model.n_spin_components
    from ..ops.density import compute_density
    from ..ops import fft as fftops

    psi = jnp.asarray(psi)
    occupation = jnp.asarray(occupation)
    if rho is None:
        rho = compute_density(bd, psi, occupation, fft_size, vol, nspin)
    Gcart = jnp.asarray(basis.G_cube_cart)
    V0, _ = hamops.total_potential(terms, rho, Gcart, vol)
    ham0 = hamops.build_ham(bd, terms.data, V0)
    hpsi = hamops.apply_H(ham0, psi, fft_size, vol)
    lam = jnp.einsum("kng,kmg->knm", psi.conj(), hpsi)
    eps_n = jnp.real(jnp.einsum("knn->kn", lam))

    def Pc(x):
        ov = jnp.einsum("kng,kmg->knm", psi.conj(), x)
        return x - jnp.einsum("knm,kng->kmg", ov, psi)

    def Kpart(dpsi):
        _, drho = jax.jvp(lambda p: compute_density(
            bd, p, occupation, fft_size, vol, nspin), (psi,), (dpsi,))

        def pot(r):
            V, _ = hamops.total_potential(terms, r, Gcart, vol)
            return V
        _, dV = jax.jvp(pot, (rho,), (drho,))
        cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
            c, i, m, fft_size))(psi, bd.Gidx, bd.mask)
        psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))
        dVpsi = jax.vmap(fftops.gather_from_cube)(
            jnp.fft.fftn(dV[bd.kspin][:, None] * psir, axes=(-3, -2, -1)),
            bd.Gidx, bd.mask)
        return Pc(dVpsi)

    def OmegaK(dpsi):
        d = Pc(dpsi)
        h = hamops.apply_H(ham0, d, fft_size, vol)
        out = Pc(h - eps_n[:, :, None].astype(d.dtype) * d)
        if include_K:
            out = out + Kpart(d)
        return out

    kin = terms.data.kinetic_scale * bd.kin
    mean_kin = jnp.maximum(
        jnp.einsum("kng,kg,kng->kn", psi.conj(), kin, psi).real, 1e-12)

    def M(x):
        return x * (mean_kin[:, :, None]
                    / (mean_kin[:, :, None] + kin[:, None, :] + 1e-20))

    return OmegaK, Pc, M


def eigen_omega_plus_k(basis, psi, occupation, n_eigs=3, tol=1e-7,
                       maxiter=200, include_K=True, rho=None, seed=0):
    """Smallest eigenvalues of the SCF Jacobian Omega(+K) on the tangent
    space (reference test/compute_jacobian_eigen.jl): block LOBPCG with the
    TPA preconditioner.  At a stable insulating ground state the spectrum
    is positive; for the linear (no Hartree/Xc jvp contribution = bare
    Omega) case the smallest eigenvalue equals the HOMO-LUMO gap.

    Returns (eigenvalues [n_eigs], eigenvectors [n_eigs, nk, n_occ, nG]).
    """
    import numpy as _np
    A, Pc, M = make_omega_plus_k(basis, psi, occupation, rho=rho,
                                 include_K=include_K)
    A_j = jax.jit(A)
    m = n_eigs
    rng = _np.random.default_rng(seed)
    shp = jnp.asarray(psi).shape

    def rand_tangent():
        v = rng.standard_normal(shp) + 1j * rng.standard_normal(shp)
        return Pc(jnp.asarray(v) * basis.data.mask[:, None, :])

    def dot(a, b):
        return complex(jnp.vdot(a, b))

    def rr(S):
        """Rayleigh-Ritz on span(S); returns (theta, vectors, AS)."""
        AS = [A_j(s) for s in S]
        n = len(S)
        G = _np.array([[dot(S[i], S[j]) for j in range(n)] for i in range(n)])
        H = _np.array([[dot(S[i], AS[j]) for j in range(n)] for i in range(n)])
        # whiten (drop near-null directions), solve the projected problem
        w, U = _np.linalg.eigh((G + G.conj().T) / 2)
        keep = w > 1e-10 * w.max()
        W = U[:, keep] / _np.sqrt(w[keep])
        Hw = W.conj().T @ ((H + H.conj().T) / 2) @ W
        th, Y = _np.linalg.eigh(Hw)
        C = W @ Y
        vecs = [sum(C[i, j] * S[i] for i in range(n)) for j in range(C.shape[1])]
        return th, vecs

    X = [rand_tangent() for _ in range(m)]
    th, X = (lambda t, v: (t[:m], v[:m]))(*rr(X))
    P = []
    for _ in range(maxiter):
        AX = [A_j(x) for x in X]
        R = [ax - t * x for ax, t, x in zip(AX, th, X)]
        resid = max(float(jnp.linalg.norm(r)) for r in R)
        if resid < tol:
            break
        W_blk = [Pc(M(r)) for r in R]
        th_all, vecs = rr(X + W_blk + P)
        X_new = vecs[:m]
        th = th_all[:m]
        P = vecs[m:2 * m]
        X = X_new
    return _np.asarray(th[:m]), X


def solve_omega_plus_k(basis, psi, occupation, rhs, rho=None,
                       cg_tol=1e-9, cg_maxiter=200):
    """Solve (Omega + K) dpsi = -P_c rhs for the orbital response
    (reference src/response/hessian.jl solve_OmegaplusK / _split).

    psi [nk, n_occ, nG] occupied orbitals of a converged insulating state;
    rhs [nk, n_occ, nG] an arbitrary Hamiltonian perturbation applied to
    psi (dH psi).  Returns dpsi orthogonal to the occupied space.  The
    same operator the Newton SCF and the elastic response use.
    """
    psi = jnp.asarray(psi)
    OmegaK, Pc, M = make_omega_plus_k(basis, psi, occupation, rho=rho,
                                      include_K=True)

    @jax.jit
    def cg(b):
        x = jnp.zeros_like(b)
        r = b
        z = M(r)
        p = z
        rz = jnp.vdot(r, z).real

        def body(state):
            x, r, z, p, rz, it = state
            Ap = OmegaK(p)
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
        out = jax.lax.while_loop(cond, body,
                                 (x, r, z, p, rz, jnp.asarray(0)))
        return Pc(out[0])

    return cg(-Pc(jnp.asarray(rhs)))
