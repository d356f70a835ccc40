"""XC functionals: analytic values and autodiff potentials.

Reference values computed from the published parametrisations (same
formulas libxc implements for lda_x / lda_c_vwn / lda_c_pw / PBE).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from dftk_tpu.ops.xc.functionals import (FUNCTIONALS, lda_c_pw_energy,
                                         lda_c_vwn_energy, lda_x_energy)


def test_lda_x_value_and_potential():
    rho = jnp.asarray([[1.0]])
    e = float(jnp.sum(lda_x_energy(rho)))
    assert abs(e - (-3 / 4 * (3 / math.pi) ** (1 / 3))) < 1e-14
    # potential: v_x = -(3 rho / pi)^{1/3} = (4/3) eps_x
    v = jax.grad(lambda r: jnp.sum(lda_x_energy(r)))(rho)
    assert abs(float(v[0, 0]) - (-((3 / math.pi) ** (1 / 3)))) < 1e-14


def test_lda_x_spin_scaling():
    """E_x[ra, rb] = (E_x[2ra] + E_x[2rb]) / 2."""
    ra, rb = 0.3, 0.7
    pol = float(jnp.sum(lda_x_energy(jnp.asarray([[ra], [rb]]))))
    up = float(jnp.sum(lda_x_energy(jnp.asarray([[2 * ra]]))))
    dn = float(jnp.sum(lda_x_energy(jnp.asarray([[2 * rb]]))))
    assert abs(pol - (up + dn) / 2) < 1e-14


def test_vwn_reference_value():
    """VWN5 eps_c(rs=1) ~ -0.060 Ha (Ceperley-Alder QMC fit region), and it
    must agree with the independent PW92 parametrisation to ~1 mHa."""
    rho = 3 / (4 * math.pi)   # rs = 1
    e = float(jnp.sum(lda_c_vwn_energy(jnp.asarray([[rho]])))) / rho
    assert abs(e - (-0.060)) < 1e-3
    for rs in (0.5, 1.0, 2.0, 5.0, 10.0):
        r = 3 / (4 * math.pi * rs ** 3)
        e_vwn = float(jnp.sum(lda_c_vwn_energy(jnp.asarray([[r]])))) / r
        e_pw = float(jnp.sum(lda_c_pw_energy(jnp.asarray([[r]])))) / r
        assert abs(e_vwn - e_pw) < 1.5e-3


def test_pw_reference_value():
    """PW92 eps_c(rs=2, zeta=0) = -0.0448 Ha (Perdew-Wang 1992, Table I region)."""
    rho = 3 / (4 * math.pi * 2 ** 3)
    e = float(jnp.sum(lda_c_pw_energy(jnp.asarray([[rho]])))) / rho
    assert abs(e - (-0.0448)) < 2e-4


def test_pw_spin_limits():
    """zeta=1 limit uses the ferromagnetic parametrisation."""
    rho = 3 / (4 * math.pi * 4 ** 3)  # rs = 4
    e_para = float(jnp.sum(lda_c_pw_energy(jnp.asarray([[rho / 2], [rho / 2]])))) / rho
    e_unpol = float(jnp.sum(lda_c_pw_energy(jnp.asarray([[rho]])))) / rho
    assert abs(e_para - e_unpol) < 1e-10
    e_ferro = float(jnp.sum(lda_c_pw_energy(jnp.asarray([[rho], [rho * 1e-16]])))) / rho
    assert e_ferro > e_unpol  # correlation weaker when polarised


def test_pbe_reduces_to_lda_at_zero_gradient():
    rho = jnp.asarray([[0.4]])
    sigma = jnp.asarray([[0.0]])
    ex_pbe = float(jnp.sum(FUNCTIONALS["gga_x_pbe"].energy(rho, sigma)))
    ex_lda = float(jnp.sum(lda_x_energy(rho)))
    assert abs(ex_pbe - ex_lda) < 1e-12
    ec_pbe = float(jnp.sum(FUNCTIONALS["gga_c_pbe"].energy(rho, sigma)))
    ec_pw = float(jnp.sum(lda_c_pw_energy(rho)))
    assert abs(ec_pbe - ec_pw) < 1e-10


def test_pbe_enhancement_bounded():
    """F_x stays within [1, 1+kappa]."""
    rho = jnp.asarray([[0.4]])
    ex0 = float(jnp.sum(FUNCTIONALS["gga_x_pbe"].energy(rho, jnp.asarray([[0.0]]))))
    ex_inf = float(jnp.sum(FUNCTIONALS["gga_x_pbe"].energy(rho, jnp.asarray([[1e8]]))))
    assert ex_inf < ex0 < 0
    assert ex_inf / ex0 < 1.805  # 1 + kappa


def test_potentials_finite_everywhere():
    rng = np.random.default_rng(0)
    rho = jnp.asarray(np.abs(rng.normal(size=(1, 4, 4, 4)))) + 1e-6
    for name in ("lda_x", "lda_c_vwn", "lda_c_pw"):
        f = FUNCTIONALS[name]
        v = jax.grad(lambda r: jnp.sum(f.energy(r, None)))(rho)
        assert np.all(np.isfinite(np.asarray(v)))


def test_gradients_finite_at_negative_density_f32():
    """Mixing can overshoot into slightly negative densities; the XC
    gradients must stay finite in f32 (the squared denominator floors must
    not underflow - this NaN'd metallic SCF on the chip)."""
    import jax
    import jax.numpy as jnp
    from dftk_tpu.ops.xc import functionals as F

    rho = jnp.asarray([[-1e-5, 1e-12, 1e-3, 0.02]], dtype=jnp.float32)
    sigma = jnp.asarray([[1e-6, 1e-8, 1e-6, 1e-4]], dtype=jnp.float32)
    for fn in (F.lda_x_energy, F.gga_x_pbe_energy, F.gga_c_pbe_energy,
               F.gga_x_pbe_sol_energy, F.gga_c_pbe_sol_energy):
        g = jax.grad(lambda r: jnp.sum(fn(r, sigma)))(rho)
        gs = jax.grad(lambda s: jnp.sum(fn(rho, s)))(sigma)
        assert bool(jnp.all(jnp.isfinite(g))), fn
        assert bool(jnp.all(jnp.isfinite(gs))), fn
