"""Standalone total-energy evaluation of a given state, and the f64
refinement of chip-f32 SCF results (BASELINE accuracy bar, VERDICT #3).

The SCF energy is variational in (psi, rho): evaluating the energy
functional of an f32-converged state in f64 leaves an error that is only
SECOND order in the f32 state error (O(1e-12) for ||delta psi|| ~ 1e-6),
so a single host-side f64 evaluation upgrades a chip run to the 1e-8
Ha/atom bar without any f64 device arithmetic.  Reference bar:
BASELINE.md:28, test/silicon_lda.jl:20.

Run under an x64-enabled CPU process (tests; or the two-phase tools/
run_si_big.py flow where the chip phase saves state to npz).
"""
import numpy as np

import jax
import jax.numpy as jnp

from ..ops import hamiltonian as hamops
from ..ops.density import compute_density, make_symmetrizer
from ..ops.occupation import compute_occupation, entropy_energy


def evaluate_total_energy(basis, psi, occupation, eigenvalues=None,
                          epsF=None, rho=None):
    """Energies dict (incl. "total") for a fixed state at ambient precision.

    psi [nk, nb, nG] complex, occupation [nk, nb]; rho is re-derived from
    psi unless given.  Mirrors the per-iteration energy assembly of
    scf/driver.py:267-291 (without EXX/Hubbard, which the split engine
    does not produce states for yet).
    """
    model = basis.model
    terms = basis.terms
    bd = basis.data
    td = terms.data
    fft_size = basis.fft_size
    volume = model.unit_cell_volume
    nspin = model.n_spin_components

    psi = jnp.asarray(psi)
    occupation = jnp.asarray(occupation, dtype=jnp.float64
                             if jax.config.jax_enable_x64 else jnp.float32)
    if rho is None:
        symmetrizer = make_symmetrizer(basis)
        rho = compute_density(bd, psi, occupation, fft_size, volume, nspin,
                              symmetrizer=symmetrizer)
    else:
        rho = jnp.asarray(rho)

    Gcart = jnp.asarray(basis.G_cube_cart)
    V, energies = hamops.total_potential(terms, rho, Gcart, volume)
    ham = hamops.build_ham(bd, td, V)
    energies.update(hamops.psi_energies(ham, terms, psi, occupation,
                                        bd.kweights))
    if terms.has_entropy and eigenvalues is not None and epsF is not None:
        energies["Entropy"] = entropy_energy(
            jnp.asarray(eigenvalues), bd.kweights, epsF, model.temperature,
            model.smearing, model.filled_occupation)
    energies = {k: float(jax.device_get(v)) for k, v in energies.items()}
    energies["Ewald"] = float(terms.E_ewald)
    energies["PspCorrection"] = float(terms.E_psp_correction)
    energies["total"] = float(sum(energies.values()))
    return energies


def split_state_to_complex(basis, U, occupation, band_repr="complex"):
    """Convert split-engine orbitals back to complex psi + per-band occ.

    band_repr "complex" (csplit rows ARE complex bands: row = [x; y]):
    psi = x + i y, occ unchanged.  "paired": the first nb rows carry
    (x; y) with occ f/2 per row; psi from those rows, occ doubled.
    """
    U = np.asarray(jax.device_get(U), dtype=np.float64)
    occ = np.asarray(jax.device_get(occupation), dtype=np.float64)
    nG = U.shape[-1] // 2
    if band_repr == "paired":
        nb = U.shape[1] // 2
        U, occ = U[:, :nb], 2 * occ[:, :nb]
    psi = U[..., :nG] + 1j * U[..., nG:]
    # rows are orthonormal as REAL vectors; complex bands need unit complex
    # norm too (they are, up to f32 rounding) - renormalize defensively
    nrm = np.sqrt(np.sum(np.abs(psi) ** 2, axis=-1, keepdims=True))
    psi = psi / np.maximum(nrm, 1e-12)
    return psi, occ


def refine_split_energy(basis, split_res, band_repr="complex"):
    """f64 energy of a split-SCF result dict (run on an x64 CPU process)."""
    psi, occ = split_state_to_complex(basis, split_res["U"],
                                      split_res["occupation"], band_repr)
    ev = split_res.get("eigenvalues")
    return evaluate_total_energy(basis, psi, occ, eigenvalues=ev,
                                 epsF=split_res.get("epsF"))


def refine_split_state(basis, split_res, tol=1e-10, maxiter=12,
                       band_repr="complex", occupation_threshold=1e-8,
                       **scf_kwargs):
    """Polish a chip-f32 state BELOW the f32 floor (VERDICT r2 item #3).

    The split SCF stalls at drho ~ 1e-4..5e-4 (f32 rounding floor); the
    variational argument (refine_split_energy) certifies the ENERGY, but
    everything LINEAR in the state error - forces, stresses, DFPT -
    inherits ~1e-6.  This runs a few warm-started f64 SCF iterations from
    the chip state (same LOBPCG machinery, host CPU/x64): the start is
    deep inside the quadratic basin, so 2-5 iterations reach drho < 1e-10,
    after which force/stress/response evaluations are full-f64 quality.

    Returns a standard SCFResult (usable by compute_forces,
    elastic_tensor_response, dynmat_dfpt_gamma, ...).  Cost: a handful of
    f64 iterations vs a full from-scratch f64 SCF's tens.  Reference
    accuracy bar: test/gpu.jl:25-47 parity values.
    """
    from .driver import self_consistent_field
    psi, occ = split_state_to_complex(basis, split_res["U"],
                                      split_res["occupation"], band_repr)
    rho = jnp.asarray(np.asarray(jax.device_get(split_res["rho"]),
                                 dtype=np.float64))
    nb_total = psi.shape[1]
    n_occ = int(np.max(np.sum(occ > occupation_threshold, axis=1)))
    n_occ = max(1, min(n_occ, nb_total))
    # the state is already at the f32 floor: start LOBPCG tight instead of
    # walking the usual diagtol ladder down from 5e-3
    scf_kwargs.setdefault("diagtol_max", 1e-6)
    return self_consistent_field(basis, tol=tol, maxiter=maxiter,
                                 rho=rho, psi=jnp.asarray(psi),
                                 n_bands=n_occ,
                                 n_extra_bands=nb_total - n_occ,
                                 **scf_kwargs)
