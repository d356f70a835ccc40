"""Analysing SCF convergence: the dielectric operator's largest eigenvalue
sets the fixed-point rate; Kerker/dielectric mixing compresses it.

Mirrors the reference examples/analysing_scf_convergence.jl: for a
simple-mixed SCF the error contracts like |1 - alpha*lambda| with lambda
the eigenvalues of eps^dagger = 1 - chi0 (v + K_xc).  We estimate the
largest eigenvalue of the full dielectric map by power iteration on
apply_chi0 + the Hartree kernel, for silicon (insulator: modest
condition number) — explaining the iteration counts seen with and
without preconditioning.
"""
import numpy as np

import dftk_tpu as dftk


def main():
    a = 5.131570667152971
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0.0]])
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    model = dftk.model_DFT(lattice, [Si, Si],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals=["lda_x", "lda_c_vwn"])
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(2, 2, 2),
                                fft_size=(18, 18, 18))
    scfres = dftk.self_consistent_field(basis, tol=1e-8, n_bands=12)

    ctx = dftk.make_chi0_context(scfres, basis)
    G2 = np.sum(np.asarray(basis.G_cube_cart) ** 2, axis=-1)
    vG = np.where(G2 > 1e-12, 4 * np.pi / np.maximum(G2, 1e-12), 0.0)

    def eps_dagger(drho):
        # (1 - chi0 v) drho, the Hartree-only dielectric adjoint
        dV = np.fft.ifftn(vG * np.fft.fftn(drho)).real
        chi0_dV = np.asarray(dftk.apply_chi0(ctx, basis, dV[None]))[0]
        return drho - chi0_dV

    rng = np.random.default_rng(0)
    v = rng.standard_normal(basis.fft_size)
    v -= v.mean()
    lam = 0.0
    for _ in range(12):
        w = eps_dagger(v)
        w -= w.mean()
        lam = float(np.vdot(v, w) / np.vdot(v, v))
        v = w / np.linalg.norm(w)
    print(f"largest dielectric eigenvalue (silicon): {lam:.2f} "
          "(~ macroscopic eps_r ~ 12-14 at this discretisation)")
    assert 5 < lam < 40

    # the practical consequence: damping must be ~< 2/lambda for plain
    # mixing, while a dielectric-model preconditioner fixes the rate
    it_simple = dftk.self_consistent_field(
        basis, tol=1e-7, mixing=dftk.SimpleMixing(alpha=0.8),
        maxiter=60).n_iter
    it_precond = dftk.self_consistent_field(
        basis, tol=1e-7, mixing=dftk.DielectricMixing(epsilon_r=lam),
        maxiter=60).n_iter
    print(f"iterations: simple(0.8) = {it_simple}, "
          f"dielectric-preconditioned = {it_precond}")
    return lam


if __name__ == "__main__":
    main()
