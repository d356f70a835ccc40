"""FFT layer: round trips, normalization conventions, sphere scatter/gather.

Mirrors the reference's test/fourier_transforms.jl strategy.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops import fft as fftops


@pytest.fixture(scope="module")
def si_basis():
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    return dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                               fft_size=(18, 18, 18))


def test_cube_roundtrip(si_basis):
    rng = np.random.default_rng(0)
    f = rng.normal(size=si_basis.fft_size) + 1j * rng.normal(size=si_basis.fft_size)
    f = jnp.asarray(f)
    back = si_basis.fft_cube(si_basis.ifft_cube(f))
    np.testing.assert_allclose(np.asarray(back), np.asarray(f), atol=1e-12)


def test_parseval(si_basis):
    """sum_G |f_G|^2 == integral |f(r)|^2 dr with our conventions."""
    rng = np.random.default_rng(1)
    fG = jnp.asarray(rng.normal(size=si_basis.fft_size)
                     + 1j * rng.normal(size=si_basis.fft_size))
    fr = si_basis.ifft_cube(fG)
    lhs = float(jnp.sum(jnp.abs(fG) ** 2))
    rhs = float(jnp.sum(jnp.abs(fr) ** 2)) * si_basis.dvol
    assert abs(lhs - rhs) / lhs < 1e-12


def test_sphere_roundtrip(si_basis):
    rng = np.random.default_rng(2)
    nG = si_basis.nG_max
    c = jnp.asarray((rng.normal(size=nG) + 1j * rng.normal(size=nG))
                    * si_basis.mask_np[0])
    fr = si_basis.ifft_sphere(0, c)
    back = si_basis.fft_sphere(0, fr)
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=1e-12)


def test_plane_wave_is_delta(si_basis):
    """A single normalised plane wave e^{iGr}/sqrt(vol) has unit coefficient."""
    G = np.array([1, 2, 0])
    vol = si_basis.model.unit_cell_volume
    r_cart = np.einsum("ab,xyzb->xyza", si_basis.model.lattice, si_basis.r_cube)
    Gcart = si_basis.model.recip_lattice @ G
    f = np.exp(1j * r_cart @ Gcart) / np.sqrt(vol)
    fG = np.asarray(si_basis.fft_cube(jnp.asarray(f)))
    idx = fftops.index_G_vectors(si_basis.fft_size, G)
    flat = fG.reshape(-1)
    assert abs(flat[idx] - 1.0) < 1e-12
    flat = flat.copy()
    flat[idx] = 0
    assert np.max(np.abs(flat)) < 1e-12


def test_index_G_vectors():
    fft_size = (6, 7, 8)
    Gs = fftops.G_vectors_cube(fft_size).reshape(-1, 3)
    idx = fftops.index_G_vectors(fft_size, Gs)
    np.testing.assert_array_equal(idx, np.arange(len(Gs)))
    assert fftops.index_G_vectors(fft_size, np.array([99, 0, 0])) == -1


def test_compute_fft_size():
    from testcases import silicon
    # supersampling 2 at Ecut=7 on the silicon lattice
    size = fftops.compute_fft_size(silicon["lattice"], 7.0)
    assert all(s >= 15 for s in size)
    # small primes only
    for s in size:
        n = s
        for p in (2, 3, 5):
            while n % p == 0:
                n //= p
        assert n == 1
