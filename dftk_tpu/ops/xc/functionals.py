"""Exchange-correlation functionals in pure jnp (TPU-native libxc subset).

The reference delegates XC evaluation to libxc (native C) through
`src/DispatchFunctional.jl`.  Here the needed functionals are reimplemented
as differentiable jnp expressions; potentials (and kernels for response) are
obtained by `jax.grad` through the energy - including the GGA divergence
term, since the density gradient is computed by FFT *inside* the
differentiated graph.

Implemented (names follow libxc):
  lda_x, lda_c_vwn (VWN5), lda_c_pw (PW92),
  gga_x_pbe, gga_c_pbe, gga_x_pbe_sol, gga_c_pbe_sol

Each functional maps spin densities (and contracted gradients for GGA) to an
energy density per unit volume; spin interpolation uses the standard
(Oliver-Perdew / VWN) schemes.  Formulas from the original publications:
Slater/Dirac exchange; Vosko-Wilk-Nusair 1980 (param. V); Perdew-Wang 1992;
Perdew-Burke-Ernzerhof 1996 (+PBEsol 2008 constants).

Conventions: rho has shape [nspin, ...] with nspin in {1, 2};
sigma = |grad rho|^2 contractions with shape [3, ...] for nspin=2
([1, ...] for nspin=1): sigma_aa, sigma_ab, sigma_bb.
"""
import dataclasses
import math
from typing import Callable, Optional

import jax.numpy as jnp

_RHO_EPS = 1e-14        # libxc-style density threshold


def _safe_rho(rho):
    return jnp.maximum(rho, _RHO_EPS)


def _den_floor(x):
    """Floor for squared-denominator expressions like (2 kF rho)^2.

    Must be large enough that 1/floor^2 (which appears in the GRADIENT of
    sigma/denominator) stays finite in the working dtype: 1e-40 is fine in
    f64 but its square underflows in f32, turning mixing overshoots into
    negative-density NaNs on reduced-precision backends.
    """
    floor = 1e-15 if jnp.finfo(jnp.result_type(x)).bits <= 32 else 1e-40
    return jnp.maximum(x, floor)


def _rs_from_rho(rho):
    return (3 / (4 * math.pi * _safe_rho(rho))) ** (1 / 3)


# ---------------------------------------------------------------------------
# LDA exchange (Slater / Dirac)
# ---------------------------------------------------------------------------

_CX = -3 / 4 * (3 / math.pi) ** (1 / 3)


def lda_x_energy(rho, sigma=None):
    """Energy density per volume: sum_s 0.5 * e_x[2 rho_s] (exact spin scaling)."""
    nspin = rho.shape[0]
    if nspin == 1:
        r = _safe_rho(rho[0])
        return _CX * r ** (4 / 3)
    ra, rb = _safe_rho(rho[0]), _safe_rho(rho[1])
    return _CX * ((2 * ra) ** (4 / 3) + (2 * rb) ** (4 / 3)) / 2


# ---------------------------------------------------------------------------
# VWN5 correlation
# ---------------------------------------------------------------------------

def _vwn_eps(rs, A, x0, b, c):
    x = jnp.sqrt(rs)
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = math.sqrt(4 * c - b * b)
    atn = jnp.arctan2(Q, 2 * x + b)
    return A * (jnp.log(x * x / X) + 2 * b / Q * atn
                - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X)
                                 + 2 * (b + 2 * x0) / Q * atn))


_VWN_PARA = (0.0310907, -0.10498, 3.72744, 12.9352)
_VWN_FERRO = (0.01554535, -0.32500, 7.06042, 18.0578)
_VWN_STIFF = (-1 / (6 * math.pi ** 2), -0.0047584, 1.13107, 13.0045)
_FZ_DD0 = 8 / (9 * (2 ** (4 / 3) - 2))   # f''(0)


def _f_zeta(zeta):
    return (((1 + zeta) ** (4 / 3) + (1 - zeta) ** (4 / 3) - 2)
            / (2 ** (4 / 3) - 2))


def lda_c_vwn_energy(rho, sigma=None):
    nspin = rho.shape[0]
    rho_tot = _safe_rho(jnp.sum(rho, axis=0))
    rs = _rs_from_rho(rho_tot)
    eps_p = _vwn_eps(rs, *_VWN_PARA)
    if nspin == 1:
        return rho_tot * eps_p
    zeta = jnp.clip((rho[0] - rho[1]) / rho_tot, -1 + 1e-15, 1 - 1e-15)
    eps_f = _vwn_eps(rs, *_VWN_FERRO)
    alpha = _vwn_eps(rs, *_VWN_STIFF)
    fz = _f_zeta(zeta)
    z4 = zeta ** 4
    eps = eps_p + alpha * fz / _FZ_DD0 * (1 - z4) + (eps_f - eps_p) * fz * z4
    return rho_tot * eps


# ---------------------------------------------------------------------------
# PW92 correlation
# ---------------------------------------------------------------------------

def _pw_G(rs, A, a1, b1, b2, b3, b4, p=1.0):
    srs = jnp.sqrt(rs)
    den = 2 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs ** (p + 1))
    return -2 * A * (1 + a1 * rs) * jnp.log1p(1.0 / den)


_PW_PARA = (0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
_PW_FERRO = (0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
_PW_STIFF = (0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)


def _pw_eps(rs, zeta=None):
    eps_p = _pw_G(rs, *_PW_PARA)
    if zeta is None:
        return eps_p
    eps_f = _pw_G(rs, *_PW_FERRO)
    alpha = -_pw_G(rs, *_PW_STIFF)   # fit is for -alpha_c
    fz = _f_zeta(zeta)
    z4 = zeta ** 4
    return eps_p + alpha * fz / _FZ_DD0 * (1 - z4) + (eps_f - eps_p) * fz * z4


def lda_c_pw_energy(rho, sigma=None):
    nspin = rho.shape[0]
    rho_tot = _safe_rho(jnp.sum(rho, axis=0))
    rs = _rs_from_rho(rho_tot)
    if nspin == 1:
        return rho_tot * _pw_eps(rs)
    zeta = jnp.clip((rho[0] - rho[1]) / rho_tot, -1 + 1e-15, 1 - 1e-15)
    return rho_tot * _pw_eps(rs, zeta)


# ---------------------------------------------------------------------------
# Teter 93 combined XC (the Pade fit used alongside GTH psps; GTH96 appendix)
# ---------------------------------------------------------------------------

_T93_A = (0.4581652932831429, 2.217058676663745, 0.7405551735357053,
          0.01968227878617998)
_T93_DA = (0.119086804055547, 0.6157402568883345, 0.1574201515892867,
           0.003532336663397157)
_T93_B = (1.0, 4.504130959426697, 1.110667363742916, 0.02359291751427506)
_T93_DB = (0.0, 0.2673612973836267, 0.2052004607777787, 0.004200005045691381)


def lda_xc_teter93_energy(rho, sigma=None):
    nspin = rho.shape[0]
    rho_tot = _safe_rho(jnp.sum(rho, axis=0))
    rs = _rs_from_rho(rho_tot)
    if nspin == 1:
        fz = 0.0
    else:
        zeta = jnp.clip((rho[0] - rho[1]) / rho_tot, -1 + 1e-15, 1 - 1e-15)
        fz = _f_zeta(zeta)
    a = [ai + fz * dai for ai, dai in zip(_T93_A, _T93_DA)]
    b = [bi + fz * dbi for bi, dbi in zip(_T93_B, _T93_DB)]
    num = a[0] + rs * (a[1] + rs * (a[2] + rs * a[3]))
    den = rs * (b[0] + rs * (b[1] + rs * (b[2] + rs * b[3])))
    return rho_tot * (-num / den)


# ---------------------------------------------------------------------------
# PBE exchange & correlation (and PBEsol variants)
# ---------------------------------------------------------------------------

_PBE_KAPPA = 0.8040
_PBE_MU = 0.2195149727645171          # beta * pi^2 / 3
_PBESOL_MU = 10 / 81
_PBE_BETA = 0.06672455060314922
_PBESOL_BETA = 0.046
_PBE_GAMMA = (1 - math.log(2.0)) / math.pi ** 2


def _pbe_x_unpol(rho, sigma, mu, kappa):
    r = _safe_rho(rho)
    kf = (3 * math.pi ** 2 * r) ** (1 / 3)
    s2 = sigma / _den_floor((2 * kf * r) ** 2)
    Fx = 1 + kappa - kappa / (1 + mu * s2 / kappa)
    return _CX * r ** (4 / 3) * Fx


def _gga_x_energy(rho, sigma, mu, kappa):
    nspin = rho.shape[0]
    if nspin == 1:
        return _pbe_x_unpol(rho[0], sigma[0], mu, kappa)
    # exact spin scaling: E_x[ra,rb] = (E_x[2ra] + E_x[2rb])/2
    ea = _pbe_x_unpol(2 * rho[0], 4 * sigma[0], mu, kappa)
    eb = _pbe_x_unpol(2 * rho[1], 4 * sigma[2], mu, kappa)
    return (ea + eb) / 2


def gga_x_pbe_energy(rho, sigma):
    return _gga_x_energy(rho, sigma, _PBE_MU, _PBE_KAPPA)


def gga_x_pbe_sol_energy(rho, sigma):
    return _gga_x_energy(rho, sigma, _PBESOL_MU, _PBE_KAPPA)


def _gga_c_pbe(rho, sigma, beta):
    nspin = rho.shape[0]
    rho_tot = _safe_rho(jnp.sum(rho, axis=0))
    rs = _rs_from_rho(rho_tot)
    if nspin == 1:
        zeta = jnp.zeros_like(rho_tot)
        sig = sigma[0]
    else:
        zeta = jnp.clip((rho[0] - rho[1]) / rho_tot, -1 + 1e-15, 1 - 1e-15)
        sig = sigma[0] + 2 * sigma[1] + sigma[2]
    eps_lda = _pw_eps(rs, None if nspin == 1 else zeta)

    phi = ((1 + zeta) ** (2 / 3) + (1 - zeta) ** (2 / 3)) / 2
    kf = (3 * math.pi ** 2 * rho_tot) ** (1 / 3)
    ks = jnp.sqrt(4 * kf / math.pi)
    t2 = sig / _den_floor((2 * phi * ks * rho_tot) ** 2)

    gamma = _PBE_GAMMA
    phi3 = phi ** 3
    A_arg = jnp.exp(-eps_lda / (gamma * phi3))
    A = beta / gamma / _den_floor(A_arg - 1)
    num = 1 + A * t2
    H = gamma * phi3 * jnp.log1p(beta / gamma * t2 * num
                                 / (num + (A * t2) ** 2))
    return rho_tot * (eps_lda + H)


def gga_c_pbe_energy(rho, sigma):
    return _gga_c_pbe(rho, sigma, _PBE_BETA)


def gga_c_pbe_sol_energy(rho, sigma):
    return _gga_c_pbe(rho, sigma, _PBESOL_BETA)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Functional:
    name: str
    family: str                        # "lda" | "gga" | "mgga"
    energy: Callable = None            # (rho, sigma[, tau]) -> energy/volume
    # potential-ONLY functionals (TB09/mBJ): no energy exists; the
    # multiplicative V is evaluated directly (ops/xc/tb09.py)
    potential: Callable = None         # (rho, G_cube_cart, tau) -> V


def _scan_wrapper(rho, sigma, tau=None):
    from .mgga import scan_energy
    return scan_energy(rho, sigma, tau)


def _r2scan_wrapper(rho, sigma, tau=None):
    from .mgga import r2scan_energy
    return r2scan_energy(rho, sigma, tau)


def _tpss_x_wrapper(rho, sigma, tau=None):
    from .mgga import tpss_x_energy
    return tpss_x_energy(rho, sigma, tau)


def _tpss_c_wrapper(rho, sigma, tau=None):
    from .mgga import tpss_c_energy
    return tpss_c_energy(rho, sigma, tau)


def _tb09_wrapper(rho, G_cube_cart, tau):
    from .tb09 import tb09_potential
    return tb09_potential(rho, G_cube_cart, tau)


# ---------------------------------------------------------------------------
# HJS omega-PBE short-range exchange (gga_x_wpbeh)
# ---------------------------------------------------------------------------
# Henderson, Janesko, Scuseria, J. Chem. Phys. 128, 194105 (2008): analytic
# erfc-screened exchange from a model PBE hole.  Used by HSE-type hybrids
# (reference src/standard_models.jl:163-166 dispatches :hyb_gga_xc_hse06 to
# libxc; here the enhancement factor is evaluated in closed form).
#
# The model-hole shape function H(s) uses the HJS rational form; its
# coefficients are REFIT here (the published table is not available in this
# environment) to the paper's design target: F(s, nu=0) reproduces the PBE
# enhancement factor.  The refit matches PBE to ~1e-5 for s in [0, 30].
#
# Exact limits (verified in tests/test_r2scan_hse.py): F(s=0, nu) equals the
# erfc-screened LDA attenuation (model-hole accuracy ~1%); F(s, nu->0) equals
# PBE; F(s, nu->inf) -> 0.

_HJS_A = 0.757211
_HJS_B = -0.106364
_HJS_C = -0.118649
_HJS_D = 0.609650
# zeta(s) = s^2 H(s), H(s) = (a1 s^2 + ... + a6 s^7)/(1 + b1 s + ... + b9 s^9)
_HJS_HA = (0.01539809, -0.03415762, 0.03319737, -0.01392621, -0.0003318682,
           0.002161391)
_HJS_HB = (-2.61897, 3.066503, -2.046006, 0.8732485, -0.2491473, 0.04988374,
           -0.003572147, -0.0001762652, 0.001713341)


def _hjs_fx_sr(s, nu):
    """HJS short-range enhancement factor F(s, nu), nu = omega / kF > 0."""
    # clip: zeta(s) is flat beyond s ~ 30, and s^9 overflows f32 for huge s
    # (vacuum regions where rho hits its floor)
    s = jnp.minimum(jnp.asarray(s), 50.0)
    num = sum(a * s ** (i + 4) for i, a in enumerate(_HJS_HA))
    den = 1.0 + sum(b * s ** (i + 1) for i, b in enumerate(_HJS_HB))
    # zeta(s) = s^2 H(s); floored: sqrt(zeta) below needs zeta > 0 for a
    # finite AD gradient (the clamp zeroes the gradient on the floored side)
    zet = jnp.maximum(num / den, 1e-30)
    eta = _HJS_A + zet
    lam = _HJS_D + zet
    F = 1.0 - s ** 2 / (27.0 * _HJS_C * (1.0 + s ** 2 / 4.0)) \
        - zet / (2.0 * _HJS_C)
    EG = (-(2.0 / 5.0) * _HJS_C * F * lam
          - (4.0 / 15.0) * _HJS_B * lam ** 2
          - (6.0 / 5.0) * _HJS_A * lam ** 3
          - (4.0 / 5.0) * math.sqrt(math.pi) * lam ** 3.5
          - (12.0 / 5.0) * lam ** 3.5 * (jnp.sqrt(zet) - jnp.sqrt(eta)))

    nu2 = nu ** 2
    chi = nu / jnp.sqrt(lam + nu2)
    szl = jnp.sqrt(zet + nu2)
    sel = jnp.sqrt(eta + nu2)
    sll = jnp.sqrt(lam + nu2)
    return (_HJS_A
            - (4.0 / 9.0) * _HJS_B / lam * (1.0 - chi)
            - (4.0 / 9.0) * _HJS_C * F / lam ** 2
            * (1.0 - 1.5 * chi + 0.5 * chi ** 3)
            - (8.0 / 9.0) * EG / lam ** 3
            * (1.0 - 1.875 * chi + 1.25 * chi ** 3 - 0.375 * chi ** 5)
            + 2.0 * nu * (szl - sel)
            + 2.0 * zet * jnp.log((nu + szl) / (nu + sll))
            - 2.0 * eta * jnp.log((nu + sel) / (nu + sll)))


def _wpbeh_unpol(rho, sigma, omega):
    r = _safe_rho(rho)
    kf = (3 * math.pi ** 2 * r) ** (1 / 3)
    s = jnp.sqrt(jnp.maximum(sigma, 1e-30) / _den_floor((2 * kf * r) ** 2))
    nu = omega / kf
    return _CX * r ** (4 / 3) * _hjs_fx_sr(s, nu)


def make_gga_x_wpbeh(omega=0.11):
    """Short-range (erfc-screened) omega-PBE exchange functional."""
    if not omega > 0:
        raise ValueError("gga_x_wpbeh needs omega > 0 (use gga_x_pbe at 0)")
    def energy(rho, sigma):
        nspin = rho.shape[0]
        if nspin == 1:
            return _wpbeh_unpol(rho[0], sigma[0], omega)
        ea = _wpbeh_unpol(2 * rho[0], 4 * sigma[0], omega)
        eb = _wpbeh_unpol(2 * rho[1], 4 * sigma[2], omega)
        return (ea + eb) / 2
    return Functional(f"gga_x_wpbeh@{omega:g}", "gga", energy)


FUNCTIONALS = {
    "lda_x": Functional("lda_x", "lda", lda_x_energy),
    "lda_c_vwn": Functional("lda_c_vwn", "lda", lda_c_vwn_energy),
    "lda_c_pw": Functional("lda_c_pw", "lda", lda_c_pw_energy),
    "lda_xc_teter93": Functional("lda_xc_teter93", "lda", lda_xc_teter93_energy),
    "gga_x_pbe": Functional("gga_x_pbe", "gga", gga_x_pbe_energy),
    "gga_c_pbe": Functional("gga_c_pbe", "gga", gga_c_pbe_energy),
    "gga_x_pbe_sol": Functional("gga_x_pbe_sol", "gga", gga_x_pbe_sol_energy),
    "gga_c_pbe_sol": Functional("gga_c_pbe_sol", "gga", gga_c_pbe_sol_energy),
    "mgga_x_scan": Functional("mgga_x_scan", "mgga", _scan_wrapper),
    "mgga_x_r2scan": Functional("mgga_x_r2scan", "mgga", _r2scan_wrapper),
    "mgga_x_tpss": Functional("mgga_x_tpss", "mgga", _tpss_x_wrapper),
    "mgga_c_tpss": Functional("mgga_c_tpss", "mgga", _tpss_c_wrapper),
    "gga_x_wpbeh": make_gga_x_wpbeh(0.11),
    "mgga_x_tb09": Functional("mgga_x_tb09", "mgga", None, _tb09_wrapper),
}

# Named functional sets mirroring DFTK standard_models.jl:163-166
FUNCTIONAL_SETS = {
    "LDA": ("lda_x", "lda_c_pw"),
    "PBE": ("gga_x_pbe", "gga_c_pbe"),
    "PBEsol": ("gga_x_pbe_sol", "gga_c_pbe_sol"),
    # SCAN/r2SCAN exchange + correlation are evaluated together (shared alpha)
    "SCAN": ("mgga_x_scan",),
    "r2SCAN": ("mgga_x_r2scan",),
    "TPSS": ("mgga_x_tpss", "mgga_c_tpss"),
    # potential-only mBJ exchange + LDA correlation (the pairing of the
    # reference's silicon_TB09 ABINIT deck); energies are non-variational
    "TB09": ("mgga_x_tb09", "lda_c_pw"),
}


def resolve_functionals(functionals):
    """Accept a set name, names, or (name, scale) pairs; returns
    [(Functional, scale), ...]."""
    if isinstance(functionals, str):
        names = FUNCTIONAL_SETS.get(functionals, (functionals,))
    else:
        names = tuple(functionals)
    out = []
    for entry in names:
        if isinstance(entry, (tuple, list)):
            name, scale = entry
        else:
            name, scale = entry, 1.0
        fun = name if isinstance(name, Functional) else FUNCTIONALS[name]
        out.append((fun, float(scale)))
    return out
