"""Tran-Blaha 2009 modified Becke-Johnson exchange potential (TB09 / mBJ).

Potential-ONLY meta-GGA (PRL 102, 226401 (2009)): there is no exchange
energy functional, only a multiplicative potential

    V_x,sigma(r) = c * V_x,sigma^BR(r)
                 + (3c - 2) / pi * sqrt(5/12) * sqrt(2 tau_sigma / rho_sigma)

with the cell-averaged inhomogeneity parameter

    c = ALPHA + BETA * sqrt( (1/V_cell) \\int |grad rho| / rho  d^3r )

and the Becke-Roussel (PRA 39, 3761 (1989)) potential

    V^BR = -(1/b) (1 - e^{-x} - x e^{-x} / 2),
    b^3 = x^3 e^{-x} / (8 pi rho_sigma),

where x solves  x e^{-2x/3} / (x - 2) = y,
    y = (2/3) pi^{2/3} rho_sigma^{5/3} / Q,
    Q = (lapl(rho_sigma) - 2 gamma D_sigma) / 6,
    D_sigma = 2 tau_sigma - |grad rho_sigma|^2 / (4 rho_sigma),  gamma = 0.8.

g(x) = x e^{-2x/3}/(x-2) is strictly decreasing on each physical branch
((0,2) -> (0,-inf) for y < 0 and (2,inf) -> (+inf,0) for y > 0; the log-
derivative 1/x - 2/3 - 1/(x-2) is sign-definite on each), so a branch-aware
bisection converges unconditionally — a fixed-trip fori_loop, fully
vectorized over the grid, with no data-dependent control flow (TPU/XLA
friendly; the classical Newton-from-interpolation route of Proynov et al.
is branchy and can step out of the basin).

tau convention: tau = 1/2 sum_n f_n |grad psi_n|^2 per spin channel
(matches ops/density.py:compute_kinetic_energy_density).

Since no energy exists, SCF total energies with TB09 are NOT variational
(every mBJ implementation shares this caveat); converge on the density and
use the eigenvalues/band structure.  Forces/stresses are undefined and
guarded against in the AD force path.

Reference exposure: DFTK dispatches :mgga_x_tb09 through libxc
(src/DispatchFunctional.jl); its ABINIT input deck test/testcases_ABINIT/
silicon_TB09 pairs it with LDA correlation, as FUNCTIONAL_SETS["TB09"] does
here.  Validation (tests/test_tb09.py): solver residuals at 1e-12, the BR
potential's exact -1/r hydrogenic asymptote, and the hallmark gap opening
on silicon vs LDA.
"""
import math

import jax
import jax.numpy as jnp

ALPHA = -0.012
BETA = 1.023          # bohr^(1/2)
GAMMA_BR = 0.8

_RHO_FLOOR = 1e-12


def _g(x):
    return x * jnp.exp(-2.0 * x / 3.0) / (x - 2.0)


def br89_x_solve(y, n_iter=80):
    """Solve x e^{-2x/3}/(x-2) = y elementwise (both branches, bisection).

    Returns x with |g(x) - y| at f64 roundoff after n_iter halvings.
    """
    y = jnp.asarray(y)
    neg = y < 0
    # negative branch: x in (0, 2); positive branch: x in (2, hi) with
    # g(x) ~ e^{-2x/3} for large x  =>  x <~ 2 - (3/2) ln y + margin
    hi_pos = 2.0 + 1.5 * jnp.maximum(0.0, -jnp.log(jnp.abs(y) + 1e-300)) + 60.0
    lo = jnp.where(neg, jnp.asarray(0.0, y.dtype), jnp.asarray(2.0, y.dtype))
    hi = jnp.where(neg, jnp.asarray(2.0, y.dtype), hi_pos)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        go_right = _g(mid) > y          # g strictly decreasing on each branch
        return (jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid))

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return 0.5 * (lo + hi)


def _br_potential_channel(rho_s, grad2_s, lapl_s, tau_s):
    """Becke-Roussel V_x for one spin channel (all inputs [*grid])."""
    rho_s = jnp.maximum(rho_s, _RHO_FLOOR)
    # von Weizsaecker bound tau >= |grad rho|^2/(8 rho) => D >= 0
    tau_w = grad2_s / (8.0 * rho_s)
    D = 2.0 * jnp.maximum(tau_s, tau_w) - grad2_s / (4.0 * rho_s)
    Q = (lapl_s - 2.0 * GAMMA_BR * D) / 6.0
    # keep y finite where Q crosses zero (x -> +inf there; e^{-x} terms die
    # and V -> -(1/b) with b ~ x e^{-x/3}, itself -> 0 harmlessly)
    Qsafe = jnp.where(jnp.abs(Q) < 1e-14, jnp.where(Q >= 0, 1e-14, -1e-14), Q)
    y = (2.0 / 3.0) * math.pi ** (2.0 / 3.0) * rho_s ** (5.0 / 3.0) / Qsafe
    x = br89_x_solve(y)
    b = (x ** 3 * jnp.exp(-x) / (8.0 * math.pi * rho_s)) ** (1.0 / 3.0)
    b = jnp.maximum(b, 1e-10)
    return -(1.0 / b) * (1.0 - jnp.exp(-x) - 0.5 * x * jnp.exp(-x))


def tb09_potential(rho, G_cube_cart, tau, c=None):
    """mBJ potential [nspin, n1, n2, n3] from spin densities and tau.

    rho/tau: [nspin, grid] per-channel (nspin=1: totals; the per-channel
    quantities rho/2, tau/2 are formed internally).  G_cube_cart includes
    the 2 pi factor (same convention as hamiltonian.xc_energy).  Pass c to
    override the cell-averaged inhomogeneity parameter (c=1 recovers the
    original Becke-Johnson 2006 potential).
    """
    nspin = rho.shape[0]
    rho_tot = jnp.sum(rho, axis=0)

    rho_G = jnp.fft.fftn(rho, axes=(-3, -2, -1))
    grads = jnp.stack([
        jnp.fft.ifftn(1j * G_cube_cart[..., a] * rho_G,
                      axes=(-3, -2, -1)).real
        for a in range(3)], axis=-1)                 # [nspin, grid, 3]
    Gsq = jnp.sum(G_cube_cart * G_cube_cart, axis=-1)
    lapl = jnp.fft.ifftn(-Gsq * rho_G, axes=(-3, -2, -1)).real

    if c is None:
        gtot = grads if nspin == 1 else jnp.sum(grads, axis=0, keepdims=True)
        gnorm = jnp.sqrt(jnp.sum(gtot[0] ** 2, axis=-1))
        avg = jnp.mean(gnorm / jnp.maximum(rho_tot, _RHO_FLOOR))
        c = ALPHA + BETA * jnp.sqrt(avg)

    half = 1.0 if nspin == 2 else 0.5        # channel = rho/2 when unpolarized
    Vs = []
    for s in range(nspin):
        Vs.append(tb09_channel(half * rho[s],
                               half * half * jnp.sum(grads[s] ** 2, axis=-1),
                               half * lapl[s], half * tau[s], c))
    return jnp.stack(Vs, axis=0)


def tb09_channel(rho_s, grad2_s, lapl_s, tau_s, c):
    """mBJ potential for one spin channel from channel ingredients; shared
    by the complex engine (spectral FFT path above) and the split (chip)
    engine (matmul-DFT path, ops/engine_split.py:tb09_potential_split)."""
    v_br = _br_potential_channel(rho_s, grad2_s, lapl_s, tau_s)
    bj = jnp.sqrt(jnp.maximum(2.0 * tau_s / jnp.maximum(rho_s, _RHO_FLOOR),
                              0.0))
    return (c * v_br
            + (3.0 * c - 2.0) / math.pi * math.sqrt(5.0 / 12.0) * bj)
