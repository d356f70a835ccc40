"""Occupation numbers and Fermi-level determination.

Mirrors DFTK `src/occupation.jl:30-170`:
  * zero temperature: integer filling; epsF midway between HOMO and LUMO
    (FermiZeroTemperature)
  * finite temperature, monotone smearing (Fermi-Dirac, Gaussian):
    bisection on the electron count excess (FermiBisection)
  * non-monotone smearing (Methfessel-Paxton, Marzari-Vanderbilt):
    Gaussian bisection for a bracket, then Newton refinement (FermiTwoStage)

Everything is fixed-iteration-count jnp code (jit/vmap/grad-safe); the
eigenvalue arrays are small so this adds negligible cost.
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.smearing import Gaussian, NoSmearing

_BISECTION_ITERS = 80
_NEWTON_ITERS = 12


def compute_occupation(eigenvalues, kweights, n_electrons, filled_occupation,
                       temperature, smearing):
    """occupation [nk, nb], epsF from eigenvalues [nk, nb].

    Eigenvalue rows for collinear spin already come as doubled k-points with
    filled_occupation == 1.
    """
    if temperature == 0 or isinstance(smearing, NoSmearing):
        return _occupation_zero_temperature(
            eigenvalues, kweights, n_electrons, filled_occupation)

    def excess(epsF, smear):
        x = (eigenvalues - epsF) / temperature
        occ = filled_occupation * smear.occupation(x)
        return jnp.sum(kweights[:, None] * occ) - n_electrons

    lo = jnp.min(eigenvalues) - 10 * temperature - 1.0
    hi = jnp.max(eigenvalues) + 10 * temperature + 1.0

    smear_mono = smearing if smearing.monotone else Gaussian()
    epsF = _bisect(lambda m: excess(m, smear_mono), lo, hi)

    if not smearing.monotone:
        # Newton refinement with the actual smearing (FermiTwoStage)
        def newton_step(mu, _):
            f, df = jax.value_and_grad(lambda m: excess(m, smearing))(mu)
            step = jnp.where(jnp.abs(df) > 1e-14, f / df, 0.0)
            step = jnp.clip(step, -10 * temperature, 10 * temperature)
            return mu - step, None
        epsF, _ = jax.lax.scan(newton_step, epsF, None, length=_NEWTON_ITERS)

    occ = filled_occupation * smearing.occupation((eigenvalues - epsF) / temperature)
    return occ, epsF


def _bisect(f, lo, hi):
    def body(_, state):
        lo, hi = state
        mid = (lo + hi) / 2
        up = f(mid) < 0
        return (jnp.where(up, mid, lo), jnp.where(up, hi, mid))
    lo, hi = jax.lax.fori_loop(0, _BISECTION_ITERS, body, (lo, hi))
    return (lo + hi) / 2


def _occupation_zero_temperature(eigenvalues, kweights, n_electrons,
                                 filled_occupation):
    n_occ = n_electrons / filled_occupation
    if abs(n_occ - round(n_occ)) > 1e-12:
        raise ValueError(
            "Without temperature, the number of electrons must be divisible "
            "by the filled occupation (no fractional band filling).")
    n_occ = int(round(n_occ))
    nb = eigenvalues.shape[1]
    if n_occ > nb:
        raise ValueError(f"Need at least {n_occ} bands, got {nb}")
    occ = jnp.where(jnp.arange(nb)[None, :] < n_occ,
                    float(filled_occupation), 0.0)
    occ = jnp.broadcast_to(occ, eigenvalues.shape)
    homo = jnp.max(eigenvalues[:, n_occ - 1])
    if n_occ < nb:
        lumo = jnp.min(eigenvalues[:, n_occ])
        epsF = (homo + lumo) / 2
    else:
        epsF = homo + 1e-3
    return occ, epsF


def entropy_energy(eigenvalues, kweights, epsF, temperature, smearing,
                   filled_occupation):
    """-T S term (DFTK terms/entropy.jl): makes F = E - T S variational."""
    if temperature == 0 or isinstance(smearing, NoSmearing):
        return jnp.asarray(0.0)
    x = (eigenvalues - epsF) / temperature
    s = smearing.entropy(x)
    return -temperature * filled_occupation * jnp.sum(kweights[:, None] * s)
