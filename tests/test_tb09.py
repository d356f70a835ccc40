"""TB09 (Tran-Blaha modified Becke-Johnson) potential-only functional.

No external golden exists (the reference ships only the ABINIT input deck,
test/testcases_ABINIT/silicon_TB09, no extracted output), so validation is
by exact properties:
- the Becke-Roussel nonlinear equation is solved to roundoff on both
  branches;
- for a hydrogenic density the BR potential reproduces the exact -1/r
  exchange-hole asymptote (BR89 is exact for single-orbital densities);
- on silicon the hallmark mBJ gap opening vs LDA, with the gap in the
  published mBJ window (~1.1-1.2 eV; Tran & Blaha PRL 102, 226401).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.xc.tb09 import _g, br89_x_solve, tb09_potential
from testcases import silicon


def test_br_solver_both_branches():
    y = jnp.concatenate([
        -jnp.logspace(-8, 6, 200),      # x in (0, 2)
        jnp.logspace(-8, 6, 200),       # x in (2, inf)
    ])
    x = br89_x_solve(y)
    assert bool(jnp.all(jnp.where(y < 0, (x > 0) & (x < 2), x > 2)))
    rel = jnp.abs(_g(x) - y) / jnp.abs(y)
    # near the pole x->2 (|y| large) the residual amplifies the f64
    # representation error of x-2 (eps/|x-2| ~ 1e-9 at y=1e6); x itself is
    # bisected to ~1e-22 absolute.  Away from the pole: roundoff.
    assert float(jnp.max(rel)) < 1e-8
    away = jnp.abs(y) < 1e3
    assert float(jnp.max(jnp.where(away, rel, 0.0))) < 1e-12


def test_br_hydrogenic_asymptote():
    """rho = e^{-2r}/pi (H 1s): BR89 is exact -> V_BR(r) -> -1/r."""
    r = jnp.linspace(4.0, 8.0, 20)
    rho = jnp.exp(-2 * r) / math.pi           # single (spin-up) channel
    grad2 = 4 * rho ** 2                       # |grad rho|^2
    lapl = 4 * rho - 4 * rho / r
    tau = rho / 2                              # tau = 1/2 |grad psi|^2
    from dftk_tpu.ops.xc.tb09 import _br_potential_channel
    v = _br_potential_channel(rho, grad2, lapl, tau)
    assert float(jnp.max(jnp.abs(v * r + 1.0))) < 0.01


def test_bj06_uniform_gas_limit():
    """c=1 (BJ06), uniform density: V = V_BR + sqrt(2 tau/rho)-term must be
    constant over the cell and finite."""
    n = 8
    rho = jnp.full((1, n, n, n), 0.3)
    tau = 0.3 * (3.0 / 10.0) * (3 * math.pi ** 2 * 0.3) ** (2.0 / 3.0) \
        * jnp.ones((1, n, n, n))
    L = 6.0
    g1 = 2 * math.pi * jnp.fft.fftfreq(n, d=L / n)
    G = jnp.stack(jnp.meshgrid(g1, g1, g1, indexing="ij"), axis=-1)
    v = tb09_potential(rho, G, tau, c=1.0)
    assert v.shape == (1, n, n, n)
    assert float(jnp.std(v)) < 1e-8
    assert np.isfinite(float(jnp.mean(v)))


@pytest.mark.slow
def test_silicon_tb09_gap_opens():
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])

    def run(functionals):
        m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                           functionals=functionals)
        b = dftk.PlaneWaveBasis(m, Ecut=14.0, kgrid=(4, 4, 4))
        r = dftk.self_consistent_field(b, tol=1e-8, maxiter=60, n_bands=8,
                                       is_converged="density")
        ev = np.asarray(r.eigenvalues)         # [nk, nb]
        homo = ev[:, 3].max()                  # 8 electrons -> 4 filled
        lumo = ev[:, 4].min()
        return (lumo - homo) * 27.211386245988

    gap_lda = run("LDA")
    gap_tb09 = run("TB09")
    # LDA on this k-grid/psp: ~0.6-0.8 eV indirect-ish gap sample; mBJ must
    # open it substantially toward the published ~1.15 eV
    assert gap_tb09 > gap_lda + 0.25
    assert 0.8 < gap_tb09 < 1.7


def test_split_engine_tb09_matches_complex_f64():
    """The chip (split) engine runs TB09 too: same SCF as the complex
    driver at f64 -- eigenvalues (hence gaps) to 1e-7."""
    from dftk_tpu.ops.engine_split import self_consistent_field_split
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                       functionals="TB09")
    b = dftk.PlaneWaveBasis(m, Ecut=8.0, kgrid=(2, 2, 2), fft_size=(18,) * 3)
    r_c = dftk.self_consistent_field(b, tol=1e-9, maxiter=60, n_bands=6,
                                     is_converged="density")
    r_s = self_consistent_field_split(b, tol=1e-9, maxiter=60,
                                      dtype=jnp.float64, n_bands=6,
                                      eigensolver="lobpcg",
                                      is_converged="density")
    ev_c = np.sort(np.asarray(r_c.eigenvalues)[:, :6], axis=1)
    ev_s = np.sort(np.asarray(r_s["eigenvalues"])[:, :6], axis=1)
    assert np.abs(ev_c - ev_s).max() < 5e-7   # both SCFs tol=1e-9 (measured 1.0e-7)


def test_tb09_collinear_paired_matches_unpolarized():
    """Collinear TB09 with a symmetric spin state equals the unpolarized
    run (validates the per-channel exchange spin-scaling)."""
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])

    def run(spin):
        m = dftk.model_DFT(silicon["lattice"], [Si, Si],
                           silicon["positions"], functionals="TB09",
                           spin_polarization=spin,
                           temperature=1e-3 if spin == "collinear" else 0.0)
        b = dftk.PlaneWaveBasis(m, Ecut=8.0, kgrid=(2, 2, 2),
                                fft_size=(18,) * 3)
        return dftk.self_consistent_field(b, tol=1e-9, maxiter=60,
                                          n_bands=6, is_converged="density")

    r_n = run("none")
    r_c = run("collinear")
    ev_n = np.sort(np.asarray(r_n.eigenvalues)[:, :5], axis=1)
    ev_c = np.asarray(r_c.eigenvalues)
    nk = ev_c.shape[0] // 2
    ev_up = np.sort(ev_c[:nk, :5], axis=1)
    ev_dn = np.sort(ev_c[nk:, :5], axis=1)
    assert np.abs(ev_up - ev_dn).max() < 1e-7
    assert np.abs(ev_up - ev_n).max() < 1e-5    # T=0 vs tiny smearing
