"""Meta-GGA functionals: SCAN (Sun-Ruzsinszky-Perdew, PRL 115, 036402 (2015))
and r2SCAN (Furness-Kaplan-Ning-Perdew-Sun, JPCL 11, 8208 (2020)).

Pure jnp, differentiable: the tau-potential (the DivAgrad operator
coefficient) and the density potential both come from jax.grad of the energy
 - the AD counterpart of the reference's libxc mgga dispatch
(DFTK DispatchFunctional.jl + terms/xc.jl DivAgradOperator).

Signature convention: energy(rho, sigma, tau) -> energy density per volume,
rho/tau [nspin, ...], sigma [1 or 3, ...] like the GGA functionals.
All formulas transcribed from the published SCAN / r2SCAN papers; the r2SCAN
second-order gradient-expansion restoration coefficients C2x/C2c are derived
from the interpolation polynomials at import time (they satisfy f(1)=0
exactly, a check in tests/test_scan.py).
"""
import math

import jax
import jax.numpy as jnp

from .functionals import (_CX, _den_floor, _f_zeta, _pw_eps,
                          _rs_from_rho, _safe_rho)

# ---- SCAN exchange constants ----------------------------------------------
_SX_K1 = 0.065
_SX_MU = 10.0 / 81.0
_SX_B2 = math.sqrt(5913.0 / 405000.0)
_SX_B1 = (511.0 / 13500.0) / (2.0 * _SX_B2)
_SX_B3 = 0.5
_SX_B4 = _SX_MU ** 2 / _SX_K1 - 1606.0 / 18225.0 - _SX_B1 ** 2
_SX_HX0 = 1.174
_SX_A1 = 4.9479
_SX_C1 = 0.667
_SX_C2 = 0.8
_SX_D = 1.24

# ---- SCAN correlation constants -------------------------------------------
_SC_B1C = 0.0285764
_SC_B2C = 0.0889
_SC_B3C = 0.125541
_SC_GAMMA = 0.031090690869654895034
_SC_CHI_INF = 0.12802585262625815
_SC_C1 = 0.64
_SC_C2 = 1.5
_SC_D = 0.7


def _interp_alpha(alpha, c1, c2, d):
    """SCAN's exp-based alpha interpolation f(alpha) (paper eq. for fx/fc)."""
    a = jnp.clip(alpha, 0.0, 1e10)
    # alpha < 1 branch: exp(-c1 a / (1 - a)); alpha > 1: -d exp(c2 / (1 - a))
    da_lo = jnp.where(a < 1.0, 1.0 - a, 1.0)
    lo = jnp.exp(-c1 * a / jnp.maximum(da_lo, 1e-14))
    da_hi = jnp.where(a > 1.0, 1.0 - a, -1.0)
    hi = -d * jnp.exp(c2 / jnp.where(a > 1.0, jnp.minimum(da_hi, -1e-14), -1.0))
    return jnp.where(a < 1.0, lo, jnp.where(a > 1.0, hi, 0.0))


def _scan_fx_unpol(rho, sigma, tau):
    """SCAN exchange enhancement * LDA exchange, for a single spin channel."""
    r = _safe_rho(rho)
    sig = jnp.maximum(sigma, 1e-30)
    t = jnp.maximum(tau, 0.0)

    kf = (3 * math.pi ** 2 * r) ** (1.0 / 3.0)
    s2 = sig / _den_floor((2 * kf * r) ** 2)
    tau_unif = 0.3 * (3 * math.pi ** 2) ** (2.0 / 3.0) * r ** (5.0 / 3.0)
    tau_w = sig / (8 * r)
    alpha = jnp.maximum(t - tau_w, 0.0) / jnp.maximum(tau_unif, 1e-30)

    oma = 1.0 - alpha
    x = (_SX_MU * s2 * (1 + (_SX_B4 * s2 / _SX_MU)
                        * jnp.exp(-jnp.abs(_SX_B4) * s2 / _SX_MU))
         + (_SX_B1 * s2 + _SX_B2 * oma * jnp.exp(-_SX_B3 * oma ** 2)) ** 2)
    h1x = 1 + _SX_K1 - _SX_K1 / (1 + x / _SX_K1)
    gx = 1 - jnp.exp(-_SX_A1 / jnp.maximum(s2, 1e-30) ** 0.25)
    fx = _interp_alpha(alpha, _SX_C1, _SX_C2, _SX_D)
    Fx = (h1x + fx * (_SX_HX0 - h1x)) * gx
    return _CX * r ** (4.0 / 3.0) * Fx


def _scan_ec(rs, zeta, s2, alpha):
    """SCAN correlation energy per particle eps_c(rs, zeta, s2, alpha)."""
    phi = ((1 + zeta) ** (2.0 / 3.0) + (1 - zeta) ** (2.0 / 3.0)) / 2
    dx_z = ((1 + zeta) ** (4.0 / 3.0) + (1 - zeta) ** (4.0 / 3.0)) / 2
    Gc = (1 - 2.3631 * (dx_z - 1)) * (1 - zeta ** 12)

    # --- eps_c^0 (alpha -> 0 limit) ---------------------------------------
    eclda0 = -_SC_B1C / (1 + _SC_B2C * jnp.sqrt(rs) + _SC_B3C * rs)
    w0 = jnp.expm1(-eclda0 / _SC_B1C)
    ginf = (1 + 4 * _SC_CHI_INF * s2) ** (-0.25)
    H0 = _SC_B1C * jnp.log1p(w0 * (1 - ginf))
    ec0 = (eclda0 + H0) * Gc

    # --- eps_c^1 (alpha ~ 1, PBE-like with rs-dependent beta) --------------
    eps_lsda = _pw_eps(rs, zeta)
    beta = 0.066725 * (1 + 0.1 * rs) / (1 + 0.1778 * rs)
    # t^2 = (3 pi^2 / 16)^{2/3} s^2 / (phi^2 rs)
    t2 = (3 * math.pi ** 2 / 16.0) ** (2.0 / 3.0) * s2 \
        / jnp.maximum(phi ** 2 * rs, 1e-30)
    w1 = jnp.expm1(-eps_lsda / (_SC_GAMMA * phi ** 3))
    A = beta / (_SC_GAMMA * jnp.maximum(w1, 1e-12))
    g_at2 = (1 + 4 * A * t2) ** (-0.25)
    H1 = _SC_GAMMA * phi ** 3 * jnp.log1p(w1 * (1 - g_at2))
    ec1 = eps_lsda + H1

    fc = _interp_alpha(alpha, _SC_C1, _SC_C2, _SC_D)
    return ec1 + fc * (ec0 - ec1)


def scan_energy(rho, sigma, tau):
    """SCAN XC energy density per volume.

    rho/tau: [nspin, grid]; sigma: [1 or 3, grid].
    """
    nspin = rho.shape[0]
    if nspin == 1:
        ex = _scan_fx_unpol(rho[0], sigma[0], tau[0])
        rho_tot = _safe_rho(rho[0])
        sig_tot = jnp.maximum(sigma[0], 1e-30)
        tau_tot = jnp.maximum(tau[0], 0.0)
        zeta = jnp.zeros_like(rho_tot)
    else:
        # exchange: exact spin scaling Ex[ra,rb] = (Ex[2ra] + Ex[2rb]) / 2
        ex = (_scan_fx_unpol(2 * rho[0], 4 * sigma[0], 2 * tau[0])
              + _scan_fx_unpol(2 * rho[1], 4 * sigma[2], 2 * tau[1])) / 2
        rho_tot = _safe_rho(rho[0] + rho[1])
        sig_tot = jnp.maximum(sigma[0] + 2 * sigma[1] + sigma[2], 1e-30)
        tau_tot = jnp.maximum(tau[0] + tau[1], 0.0)
        zeta = jnp.clip((rho[0] - rho[1]) / rho_tot, -1 + 1e-12, 1 - 1e-12)

    rs = _rs_from_rho(rho_tot)
    kf = (3 * math.pi ** 2 * rho_tot) ** (1.0 / 3.0)
    s2 = sig_tot / _den_floor((2 * kf * rho_tot) ** 2)
    tau_unif = 0.3 * (3 * math.pi ** 2) ** (2.0 / 3.0) * rho_tot ** (5.0 / 3.0)
    ds_z = ((1 + zeta) ** (5.0 / 3.0) + (1 - zeta) ** (5.0 / 3.0)) / 2
    tau_w = sig_tot / (8 * rho_tot)
    alpha = jnp.maximum(tau_tot - tau_w, 0.0) \
        / jnp.maximum(ds_z * tau_unif, 1e-30)

    ec = _scan_ec(rs, zeta, s2, alpha)
    return ex + rho_tot * ec


# ===========================================================================
# r2SCAN (Furness, Kaplan, Ning, Perdew, Sun, JPCL 11, 8208 (2020))
# ===========================================================================
# Regularizations vs SCAN: alpha-bar = (tau - tauW)/(tauU + eta tauW),
# polynomial alpha-interpolation (from rSCAN) for 0 <= a <= 2.5, and damped
# correction terms restoring the 2nd-order gradient expansion (GE2) that the
# interpolation would otherwise spoil.

_R2_ETA = 0.001
_R2_DP2 = 0.361
# C_eta: slope of (1 - alpha-bar) vs p in the slowly-varying limit
_R2_CETA = 20.0 / 27.0 + 5.0 * _R2_ETA / 3.0

# rSCAN interpolation polynomials f(a) = sum_i c_i a^i (f(1) = 0 exactly)
_R2_FX_POLY = (1.0, -0.667, -0.4445555, -0.663086601049, 1.451297044490,
               -0.887998041597, 0.234528941479, -0.023185843322)
_R2_FC_POLY = (1.0, -0.64, -0.4352, -1.535685604549, 3.061560252175,
               -1.915710236206, 0.516884468372, -0.051848879792)


def _poly_interp(alpha, coeffs, c2, d):
    """r2SCAN interpolation: polynomial for a < 2.5, damped exp beyond."""
    a = jnp.clip(alpha, 0.0, 1e10)
    lo = sum(c * a ** i for i, c in enumerate(coeffs))
    da = jnp.where(a > 2.5, 1.0 - a, -1.0)
    hi = -d * jnp.exp(c2 / jnp.where(a > 2.5, jnp.minimum(da, -1e-14), -1.0))
    return jnp.where(a < 2.5, lo, hi)


def _poly_df1(coeffs):
    """f'(1) of the interpolation polynomial (exact, at import time)."""
    return sum(i * c for i, c in enumerate(coeffs))


# GE2-restoring coefficients, derived so that the O(p) contamination of the
# interpolation term cancels on the slowly-varying manifold a = 1 - C_eta p
# (r2SCAN paper eqs. 9, 24: C2x = -(h0x - 1) |fx'(1)| = -0.162742...,
#  C2c follows from fc'(1) = -0.711403...).
_R2_DFX1 = _poly_df1(_R2_FX_POLY)          # -0.9353001...
_R2_DFC1 = _poly_df1(_R2_FC_POLY)          # -0.7114032...
_R2_C2X = (_SX_HX0 - 1.0) * _R2_DFX1       # -0.162742...


def _r2scan_fx_unpol(rho, sigma, tau):
    """r2SCAN exchange enhancement * LDA exchange for one spin channel."""
    r = _safe_rho(rho)
    sig = jnp.maximum(sigma, 1e-30)
    t = jnp.maximum(tau, 0.0)

    kf = (3 * math.pi ** 2 * r) ** (1.0 / 3.0)
    p = sig / _den_floor((2 * kf * r) ** 2)
    tau_unif = 0.3 * (3 * math.pi ** 2) ** (2.0 / 3.0) * r ** (5.0 / 3.0)
    tau_w = sig / (8 * r)
    abar = jnp.maximum(t - tau_w, 0.0) \
        / jnp.maximum(tau_unif + _R2_ETA * tau_w, 1e-30)

    # x depends on p only; the damped C2x term restores GE2 (paper eq. 9)
    damp = jnp.exp(-p ** 2 / _R2_DP2 ** 4)
    x = (_R2_CETA * _R2_C2X * damp + _SX_MU) * p
    h1x = 1 + _SX_K1 - _SX_K1 / (1 + x / _SX_K1)
    gx = 1 - jnp.exp(-_SX_A1 / jnp.maximum(p, 1e-30) ** 0.25)
    fx = _poly_interp(abar, _R2_FX_POLY, _SX_C2, _SX_D)
    Fx = (h1x + fx * (_SX_HX0 - h1x)) * gx
    return _CX * r ** (4.0 / 3.0) * Fx


def _eclda0(rs):
    """LDA0 correlation (alpha->0 limit fit) and its rs-derivative."""
    den = 1 + _SC_B2C * jnp.sqrt(rs) + _SC_B3C * rs
    e = -_SC_B1C / den
    de = _SC_B1C * (0.5 * _SC_B2C / jnp.sqrt(rs) + _SC_B3C) / den ** 2
    return e, de


def _r2scan_ec(rs, zeta, p, abar):
    """r2SCAN correlation energy per particle."""
    phi = ((1 + zeta) ** (2.0 / 3.0) + (1 - zeta) ** (2.0 / 3.0)) / 2
    dx_z = ((1 + zeta) ** (4.0 / 3.0) + (1 - zeta) ** (4.0 / 3.0)) / 2
    ds_z = ((1 + zeta) ** (5.0 / 3.0) + (1 - zeta) ** (5.0 / 3.0)) / 2
    Gc = (1 - 2.3631 * (dx_z - 1)) * (1 - zeta ** 12)

    # --- eps_c^0 (alpha -> 0), same as SCAN --------------------------------
    eclda0, declda0 = _eclda0(rs)
    w0 = jnp.expm1(-eclda0 / _SC_B1C)
    ginf = (1 + 4 * _SC_CHI_INF * p) ** (-0.25)
    H0 = _SC_B1C * jnp.log1p(w0 * (1 - ginf))
    ec0 = (eclda0 + H0) * Gc

    # --- eps_c^1 with the GE2-restoring Delta-y correction ------------------
    eps_lsda, deps_lsda = jax.jvp(lambda r_: _pw_eps(r_, zeta), (rs,),
                                  (jnp.ones_like(rs),))
    beta = 0.066725 * (1 + 0.1 * rs) / (1 + 0.1778 * rs)
    t2 = (3 * math.pi ** 2 / 16.0) ** (2.0 / 3.0) * p \
        / jnp.maximum(phi ** 2 * rs, 1e-30)
    w1 = jnp.expm1(-eps_lsda / (_SC_GAMMA * phi ** 3))
    w1s = jnp.where(jnp.abs(w1) > 1e-12, w1, 1e-12)
    y = beta / (_SC_GAMMA * w1s) * t2

    # Delta-y (paper eq. 25): cancels the O(p) term of fc(a)(ec0 - ec1) on
    # the slowly-varying manifold; damped like the exchange correction.
    damp = jnp.exp(-p ** 2 / _R2_DP2 ** 4)
    dy = _R2_DFC1 / (27 * _SC_GAMMA * ds_z * phi ** 3 * w1s) * (
        20 * rs * (Gc * declda0 - deps_lsda)
        - 45 * _R2_ETA * (ec0 - eps_lsda)) * p * damp

    g_y = jnp.maximum(1 + 4 * (y - dy), 1e-6) ** (-0.25)
    H1 = _SC_GAMMA * phi ** 3 * jnp.log1p(w1 * (1 - g_y))
    ec1 = eps_lsda + H1

    fc = _poly_interp(abar, _R2_FC_POLY, _SC_C2, _SC_D)
    return ec1 + fc * (ec0 - ec1)


# ===========================================================================
# TPSS (Tao, Perdew, Staroverov, Scuseria, PRL 91, 146401 (2003))
# ===========================================================================
# The reference dispatches :mgga_x_tpss / :mgga_c_tpss to libxc
# (src/DispatchFunctional.jl; exercised by test/hamiltonian_consistency.jl:157
# and the ABINIT input test/testcases_ABINIT/silicon_TPSS).  Transcribed here
# from the published paper; exact constraints (uniform gas -> LDA, GE2
# slowly-varying exchange expansion 1 + 10/81 p) are asserted in
# tests/test_tpss.py.

_TP_KAPPA = 0.804
_TP_B = 0.40
_TP_C = 1.59096
_TP_E = 1.537
_TP_MU = 0.21951
_TP_D = 2.8


def _tpss_fx_unpol(rho, sigma, tau):
    """TPSS exchange enhancement * LDA exchange for one spin channel."""
    r = _safe_rho(rho)
    sig = jnp.maximum(sigma, 1e-30)
    t = jnp.maximum(tau, 1e-30)

    kf = (3 * math.pi ** 2 * r) ** (1.0 / 3.0)
    p = sig / _den_floor((2 * kf * r) ** 2)
    tau_w = sig / (8 * r)
    tau_unif = 0.3 * (3 * math.pi ** 2) ** (2.0 / 3.0) * r ** (5.0 / 3.0)
    z = tau_w / jnp.maximum(t, tau_w)            # tau >= tauW exactly
    z = jnp.clip(z, 0.0, 1.0)
    alpha = jnp.maximum(t - tau_w, 0.0) / jnp.maximum(tau_unif, 1e-30)

    # qtilde_b (paper eq. 7)
    qb = (0.45 * (alpha - 1.0)
          / jnp.sqrt(1.0 + _TP_B * alpha * (alpha - 1.0))
          + 2.0 * p / 3.0)

    z2 = z * z
    mzs = (0.6 * z) ** 2                          # (3 z / 5)^2
    sqe = math.sqrt(_TP_E)
    x = ((10.0 / 81.0 + _TP_C * z2 / (1.0 + z2) ** 2) * p
         + 146.0 / 2025.0 * qb * qb
         - 73.0 / 405.0 * qb * jnp.sqrt(0.5 * mzs ** 2 + 0.5 * p * p)
         + (10.0 / 81.0) ** 2 / _TP_KAPPA * p * p
         + 2.0 * sqe * (10.0 / 81.0) * mzs
         + _TP_E * _TP_MU * p ** 3) / (1.0 + sqe * p) ** 2
    Fx = 1.0 + _TP_KAPPA - _TP_KAPPA / (1.0 + x / _TP_KAPPA)
    return _CX * r ** (4.0 / 3.0) * Fx


def tpss_x_energy(rho, sigma, tau):
    """TPSS exchange energy density per volume (spin-scaled)."""
    nspin = rho.shape[0]
    if nspin == 1:
        return _tpss_fx_unpol(rho[0], sigma[0], tau[0])
    return (_tpss_fx_unpol(2 * rho[0], 4 * sigma[0], 2 * tau[0])
            + _tpss_fx_unpol(2 * rho[1], 4 * sigma[2], 2 * tau[1])) / 2


def _pbe_eps_c(rho2, sigma3):
    """PBE correlation energy PER PARTICLE for a [2, ...] spin pair."""
    from .functionals import _gga_c_pbe, _PBE_BETA
    e_den = _gga_c_pbe(rho2, sigma3, _PBE_BETA)
    return e_den / _safe_rho(jnp.sum(rho2, axis=0))


def tpss_c_energy(rho, sigma, tau):
    """TPSS correlation energy density per volume (revPKZB based).

    rho/tau [nspin, ...], sigma [1 or 3, ...] as for the other mGGAs.
    """
    nspin = rho.shape[0]
    if nspin == 1:
        rho_tot = _safe_rho(rho[0])
        sig_tot = jnp.maximum(sigma[0], 1e-30)
        tau_tot = jnp.maximum(tau[0], 1e-30)
        zeta = jnp.zeros_like(rho_tot)
        xi2 = jnp.zeros_like(rho_tot)
        ra = rho_tot / 2
        rb = rho_tot / 2
        siga = sig_tot / 4
        sigb = sig_tot / 4
        sigab = sig_tot / 4
    else:
        ra, rb = _safe_rho(rho[0]), _safe_rho(rho[1])
        rho_tot = ra + rb
        sig_tot = jnp.maximum(sigma[0] + 2 * sigma[1] + sigma[2], 1e-30)
        tau_tot = jnp.maximum(tau[0] + tau[1], 1e-30)
        zeta = jnp.clip((rho[0] - rho[1]) / rho_tot, -1 + 1e-12, 1 - 1e-12)
        siga, sigb, sigab = sigma[0], sigma[2], sigma[1]
        # |grad zeta|^2 = 4 (rb^2 s_aa - 2 ra rb s_ab + ra^2 s_bb) / rho^4
        gz2 = 4.0 * jnp.maximum(
            rb ** 2 * sigma[0] - 2 * ra * rb * sigma[1] + ra ** 2 * sigma[2],
            0.0) / rho_tot ** 4
        kf2 = (3 * math.pi ** 2 * rho_tot) ** (2.0 / 3.0)
        xi2 = gz2 / _den_floor(4.0 * kf2)

    tau_w = sig_tot / (8 * rho_tot)
    z = jnp.clip(tau_w / jnp.maximum(tau_tot, tau_w), 0.0, 1.0)

    # C(zeta, xi) (paper eq. 13)
    z2_ = zeta * zeta
    C0 = 0.53 + 0.87 * z2_ + 0.50 * z2_ ** 2 + 2.26 * z2_ ** 3
    opz = jnp.maximum(1 + zeta, 1e-12)
    omz = jnp.maximum(1 - zeta, 1e-12)
    Cz = C0 / (1.0 + xi2 * (opz ** (-4.0 / 3.0) + omz ** (-4.0 / 3.0))
               / 2.0) ** 4

    eps_pbe = _pbe_eps_c(jnp.stack([ra, rb]),
                         jnp.stack([siga, sigab, sigb]))

    # per-spin fully-polarized PBE pieces, floored by the full eps
    zero = jnp.zeros_like(ra)
    eps_a = _pbe_eps_c(jnp.stack([ra, zero]),
                       jnp.stack([jnp.maximum(siga, 1e-30), zero, zero]))
    eps_b = _pbe_eps_c(jnp.stack([rb, zero]),
                       jnp.stack([jnp.maximum(sigb, 1e-30), zero, zero]))
    eps_a = jnp.maximum(eps_a, eps_pbe)
    eps_b = jnp.maximum(eps_b, eps_pbe)

    zz = z * z
    eps_rev = (eps_pbe * (1.0 + Cz * zz)
               - (1.0 + Cz) * zz * (ra / rho_tot * eps_a
                                    + rb / rho_tot * eps_b))
    return rho_tot * eps_rev * (1.0 + _TP_D * eps_rev * zz * z)


def tpss_energy(rho, sigma, tau):
    """Combined TPSS XC energy density per volume."""
    return tpss_x_energy(rho, sigma, tau) + tpss_c_energy(rho, sigma, tau)


def r2scan_energy(rho, sigma, tau):
    """r2SCAN XC energy density per volume.

    rho/tau: [nspin, grid]; sigma: [1 or 3, grid].  Mirrors the reference's
    libxc :mgga_x_r2scan/:mgga_c_r2scan dispatch (src/DispatchFunctional.jl).
    """
    nspin = rho.shape[0]
    if nspin == 1:
        ex = _r2scan_fx_unpol(rho[0], sigma[0], tau[0])
        rho_tot = _safe_rho(rho[0])
        sig_tot = jnp.maximum(sigma[0], 1e-30)
        tau_tot = jnp.maximum(tau[0], 0.0)
        zeta = jnp.zeros_like(rho_tot)
    else:
        ex = (_r2scan_fx_unpol(2 * rho[0], 4 * sigma[0], 2 * tau[0])
              + _r2scan_fx_unpol(2 * rho[1], 4 * sigma[2], 2 * tau[1])) / 2
        rho_tot = _safe_rho(rho[0] + rho[1])
        sig_tot = jnp.maximum(sigma[0] + 2 * sigma[1] + sigma[2], 1e-30)
        tau_tot = jnp.maximum(tau[0] + tau[1], 0.0)
        zeta = jnp.clip((rho[0] - rho[1]) / rho_tot, -1 + 1e-12, 1 - 1e-12)

    rs = _rs_from_rho(rho_tot)
    kf = (3 * math.pi ** 2 * rho_tot) ** (1.0 / 3.0)
    p = sig_tot / _den_floor((2 * kf * rho_tot) ** 2)
    tau_unif = 0.3 * (3 * math.pi ** 2) ** (2.0 / 3.0) * rho_tot ** (5.0 / 3.0)
    ds_z = ((1 + zeta) ** (5.0 / 3.0) + (1 - zeta) ** (5.0 / 3.0)) / 2
    tau_w = sig_tot / (8 * rho_tot)
    abar = jnp.maximum(tau_tot - tau_w, 0.0) \
        / jnp.maximum(ds_z * tau_unif + _R2_ETA * tau_w, 1e-30)

    ec = _r2scan_ec(rs, zeta, p, abar)
    return ex + rho_tot * ec
