"""ExternalFromValues: array-valued external potential
(reference src/terms/local.jl:26-39)."""
import numpy as np
import pytest

import dftk_tpu as dftk

A = 10.0
W0 = 0.5


def _pot(r):
    c = A / 2
    x, y = r[..., 0] - c, r[..., 1] - c
    return W0 ** 2 / 2 * (x ** 2 + y ** 2)


def _model(term):
    lattice = np.diag([A, A, 0.0])
    return dftk.Model(lattice, [], [], n_electrons=2,
                      spin_polarization="spinless",
                      term_types=[dftk.Kinetic(), term],
                      symmetries=False)


def test_values_matches_real():
    b_real = dftk.PlaneWaveBasis(_model(dftk.ExternalFromReal(_pot)),
                                 Ecut=12.0, kgrid=(1, 1, 1))
    # evaluate the same potential on the grid and feed the ARRAY
    r_cart = np.einsum("ab,xyzb->xyza", b_real.model.lattice, b_real.r_cube)
    vals = _pot(r_cart)
    b_vals = dftk.PlaneWaveBasis(_model(dftk.ExternalFromValues(vals)),
                                 Ecut=12.0, kgrid=(1, 1, 1))
    r1 = dftk.self_consistent_field(b_real, tol=1e-10, n_bands=2, maxiter=10)
    r2 = dftk.self_consistent_field(b_vals, tol=1e-10, n_bands=2, maxiter=10)
    assert abs(r1.total_energy - r2.total_energy) < 1e-12
    np.testing.assert_allclose(np.asarray(r1.eigenvalues),
                               np.asarray(r2.eigenvalues), atol=1e-10)


def test_values_shape_check():
    vals = np.zeros((4, 4, 4))
    with pytest.raises(ValueError, match="fft_size"):
        dftk.PlaneWaveBasis(_model(dftk.ExternalFromValues(vals)),
                            Ecut=12.0, kgrid=(1, 1, 1))
