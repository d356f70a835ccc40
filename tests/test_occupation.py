"""Smearing-function properties + Fermi level (reference test/occupation.jl).

Pure function-level checks: occupation limits, FD-consistency of the
occupation derivative, the entropy relation s'(x) = x f'(x), and the
Fermi-level search on a synthetic insulator spectrum (epsF inside the gap,
occupations integer at T=0 and for low T with every smearing)."""
import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.models.smearing import (FermiDirac, Gaussian,
                                      MarzariVanderbilt, MethfesselPaxton)
from dftk_tpu.ops.occupation import compute_occupation

SMEARINGS = [FermiDirac(), Gaussian(), MarzariVanderbilt(),
             MethfesselPaxton(1), MethfesselPaxton(2)]


@pytest.mark.parametrize("m", SMEARINGS, ids=lambda m: type(m).__name__ + str(
    getattr(m, "order", "")))
def test_smearing_function_properties(m):
    assert abs(float(m.occupation(jnp.asarray(-30.0))) - 1) < 1e-12
    assert abs(float(m.occupation(jnp.asarray(30.0)))) < 1e-12
    x, eps = 0.04, 1e-6
    fd = (float(m.occupation(jnp.asarray(x + eps)))
          - float(m.occupation(jnp.asarray(x - eps)))) / (2 * eps)
    assert abs(fd - float(m.occupation_derivative(jnp.asarray(x)))) < 1e-6
    # s'(x) = x f'(x)
    sp = (float(m.entropy(jnp.asarray(x + eps)))
          - float(m.entropy(jnp.asarray(x - eps)))) / (2 * eps)
    assert abs(sp - x * fd) < 1e-6


@pytest.mark.parametrize("m", SMEARINGS, ids=lambda m: type(m).__name__ + str(
    getattr(m, "order", "")))
def test_insulator_fermi_level_in_gap(m):
    """Synthetic insulator: 4 filled bands, gap of 2; every smearing at low
    T must place epsF in the gap and give integer occupations."""
    rng = np.random.default_rng(0)
    nk, nb, n_occ = 4, 10, 4
    ev = np.sort(rng.random((nk, nb)), axis=1)
    ev[:, n_occ:] += 2.0
    homo, lumo = ev[:, n_occ - 1].max(), ev[:, n_occ].min()
    w = np.full(nk, 1.0 / nk)
    occ, epsF = compute_occupation(jnp.asarray(ev), jnp.asarray(w),
                                   n_electrons=8, filled_occupation=2.0,
                                   temperature=1e-3, smearing=m)
    occ = np.asarray(occ)
    assert homo < float(epsF) < lumo
    assert np.abs(occ[:, :n_occ] - 2.0).max() < 1e-6
    assert np.abs(occ[:, n_occ:]).max() < 1e-6
    assert abs(float(jnp.sum(jnp.asarray(w)[:, None] * occ)) - 8) < 1e-10
