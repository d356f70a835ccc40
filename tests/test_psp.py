"""HGH pseudopotentials: parsing and real<->Fourier consistency.

The Fourier-space local potential and projectors are checked against direct
numerical Hankel transforms of the real-space forms (the same consistency
the reference asserts in test/hgh.jl).
"""
import math

import numpy as np
import pytest

from dftk_tpu.models.psp_hgh import load_psp_hgh, parse_hgh


def test_parse_si():
    psp = load_psp_hgh("lda/si-q4")
    assert psp.Zion == 4
    assert psp.rloc == 0.44
    assert psp.cloc[0] == -7.33610297 and psp.cloc[1] == 0.0
    assert psp.lmax == 1
    assert psp.n_proj_radial(0) == 2 and psp.n_proj_radial(1) == 1
    assert psp.n_proj() == 5
    h0 = np.array(psp.h[0])
    assert h0[0, 1] == h0[1, 0] == -1.26189397


def test_parse_fe():
    psp = load_psp_hgh("lda/fe-q8")
    assert psp.Zion == 8
    assert psp.lmax == 2
    assert psp.n_proj() == 3 * 1 + 2 * 3 + 1 * 5
    h0 = np.array(psp.h[0])
    assert h0[0, 2] == 0.79478164 and h0[1, 2] == -2.05211737


def test_local_fourier_matches_hankel():
    """V_loc(p) = 4 pi int_0^inf (V(r) + Z/r) sinc(pr) r^2 dr - 4 pi Z / p^2."""
    psp = load_psp_hgh("lda/si-q4")
    r = np.linspace(1e-8, 30.0, 300001)
    dr = r[1] - r[0]
    for p in (0.5, 1.1, 2.7):
        integrand = (psp.local_real(r) + psp.Zion / r) * np.sin(p * r) / (p * r) * r**2
        hankel = 4 * math.pi * np.trapezoid(integrand, dx=dr) - 4 * math.pi * psp.Zion / p**2
        assert abs(hankel - float(psp.local_fourier(np.array(p)))) < 1e-6


def test_projector_fourier_matches_hankel():
    """proj_il(p) = 4 pi int p_il(r) j_l(pr)/p^l r^2 dr (psp convention)."""
    from scipy.special import spherical_jn
    psp = load_psp_hgh("lda/si-q4")
    r = np.linspace(1e-9, 12.0, 120001)
    dr = r[1] - r[0]
    for (i, l) in [(1, 0), (2, 0), (1, 1)]:
        for p in (0.5, 1.3):
            integrand = psp.projector_real(i, l, r) * spherical_jn(l, p * r) * r**2
            hankel = 4 * math.pi * np.trapezoid(integrand, dx=dr) / p**l
            val = float(psp.projector_fourier(i, l, np.array(p)))
            assert abs(hankel - val) < 1e-7, (i, l, p, hankel, val)


def test_energy_correction_is_dc_limit():
    """E_corr = lim_{p->0} [V_loc(p) + 4 pi Z / p^2]."""
    psp = load_psp_hgh("lda/al-q3")
    p = 1e-4
    num = float(psp.local_fourier(np.array(p))) + 4 * math.pi * psp.Zion / p**2
    assert abs(num - psp.energy_correction()) < 1e-4


def test_load_by_symbol():
    psp = load_psp_hgh("Si")
    assert psp.Zion == 4
