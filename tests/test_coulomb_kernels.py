"""Coulomb kernel zoo: all interaction models / regularizations represent
1/r and must agree in the large-cell limit (reference src/coulomb.jl,
ext/DFTKFastGaussQuadratureExt.jl).

The probe: the periodic self-energy of a unit Gaussian charge
rho(r) = (2 pi s^2)^{-3/2} e^{-r^2/2s^2},  E = (1/2Omega) sum_G |rho(G)|^2 v(G),
which converges (at different rates per regularisation) to the isolated
value  E_exact = 1/(2 sqrt(pi) s)  when the truncation/regularisation is
correct.  This is exactly the role the kernels play in the exchange term.
"""
import math

import numpy as np
import pytest

import dftk_tpu as dftk


def _free_basis(L, Ecut=8.0):
    m = dftk.Model(np.eye(3) * L, [], [], term_types=[dftk.Kinetic()],
                   n_electrons=2, symmetries=False)
    return dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=(1, 1, 1))


def _gauss_energy(basis, cube, s=0.8):
    Gsq = np.sum(basis.G_cube_cart ** 2, axis=-1)
    rhoG2 = np.exp(-s * s * Gsq)          # |rho(G)|^2
    return 0.5 / basis.model.unit_cell_volume * float(np.sum(rhoG2 * cube))


@pytest.mark.parametrize("kernel,tol20", [
    (dftk.Coulomb(), 2e-3),                        # ProbeCharge default
    (dftk.SphericallyTruncatedCoulomb(), 2e-3),
    (dftk.WignerSeitzTruncatedCoulomb(), 2e-3),
    (dftk.Coulomb(regularization=dftk.VoxelAveraged(n_quadrature_points=8)),
     2e-2),                                        # O(1/L) DC average
])
def test_isolated_limit(kernel, tol20):
    s = 0.8
    E_exact = 1.0 / (2 * math.sqrt(math.pi) * s)
    errs = {}
    for L in (12.0, 20.0):
        basis = _free_basis(L)
        from dftk_tpu.ops.coulomb import kernel_fourier_cube
        cube = kernel_fourier_cube(kernel, basis)
        errs[L] = abs(_gauss_energy(basis, cube, s) - E_exact)
    assert errs[20.0] < tol20 * E_exact
    assert errs[20.0] < errs[12.0] + 1e-12   # converging toward isolated


def test_ws_matches_spherical_on_cube():
    """On a cubic cell the WS and spherical truncations agree for a charge
    well inside both truncation radii."""
    basis = _free_basis(16.0)
    from dftk_tpu.ops.coulomb import kernel_fourier_cube
    e_ws = _gauss_energy(basis, kernel_fourier_cube(
        dftk.WignerSeitzTruncatedCoulomb(), basis), s=0.7)
    e_sp = _gauss_energy(basis, kernel_fourier_cube(
        dftk.SphericallyTruncatedCoulomb(), basis), s=0.7)
    assert abs(e_ws - e_sp) < 2e-3 * abs(e_sp)


def test_replace_singularity_and_range_split():
    basis = _free_basis(10.0)
    from dftk_tpu.ops.coulomb import kernel_fourier_cube
    cube = kernel_fourier_cube(dftk.Coulomb(v0=3.25), basis)
    assert cube[0, 0, 0] == 3.25
    # erf/erfc split reassembles the bare kernel away from DC
    sr = kernel_fourier_cube(dftk.ShortRangeCoulomb(mu=0.3), basis)
    lr = kernel_fourier_cube(
        dftk.LongRangeCoulomb(mu=0.3,
                              regularization=dftk.ReplaceSingularity(0.0)),
        basis)
    full = kernel_fourier_cube(dftk.Coulomb(v0=0.0), basis)
    np.testing.assert_allclose((sr + lr).ravel()[1:], full.ravel()[1:],
                               rtol=1e-10)


def test_probe_charge_beats_zero_dc():
    """Probe-charge regularisation converges much faster than v0=0
    (O(1/L^3) vs O(1/L)) - the whole point of the method."""
    s = 0.8
    E_exact = 1.0 / (2 * math.sqrt(math.pi) * s)
    basis = _free_basis(16.0)
    from dftk_tpu.ops.coulomb import kernel_fourier_cube
    e_pc = _gauss_energy(basis, kernel_fourier_cube(dftk.Coulomb(), basis), s)
    e_z = _gauss_energy(basis, kernel_fourier_cube(dftk.Coulomb(v0=0.0),
                                                   basis), s)
    assert abs(e_pc - E_exact) < 0.05 * abs(e_z - E_exact)
