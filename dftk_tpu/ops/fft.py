"""FFTs between the plane-wave (Fourier) grids and the real-space grid.

Normalisation conventions identical to the reference (DFTK `src/fft.jl:76-98`):

    psi(r) = sum_G c_G e^{i G.r} / sqrt(Omega)

so  ifft = (N / sqrt(Omega)) * jnp.fft.ifftn   (DFTK: BFFT * 1/sqrt(Omega))
and fft  = (sqrt(Omega) / N) * jnp.fft.fftn.

Two grids (DFTK fft.jl:4-17):
  * cube:   densities/potentials on the full [n1,n2,n3] box (no k-point)
  * sphere: orbitals on the per-k-point G-sphere, stored densely as
    [..., nG_max] with an int32 gather/scatter map into the flattened cube
    and a validity mask (static shapes; the TPU-native replacement for
    DFTK's per-k `Kpoint.mapping`).

G-vector ordering on the cube is standard FFT frequency order; the cube index
of an integer G is (G mod n) per axis, valid iff
-ceil((n-1)/2) <= G <= floor((n-1)/2).
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def G_vectors_cube(fft_size):
    """Integer G vectors on the cube in FFT order, numpy [n1,n2,n3,3]."""
    axes = [np.fft.fftfreq(n, d=1.0 / n).round().astype(np.int64) for n in fft_size]
    G1, G2, G3 = np.meshgrid(*axes, indexing="ij")
    return np.stack([G1, G2, G3], axis=-1)


def r_vectors(fft_size):
    """Fractional real-space grid points, numpy [n1,n2,n3,3] in [0,1)^3."""
    axes = [np.arange(n) / n for n in fft_size]
    r1, r2, r3 = np.meshgrid(*axes, indexing="ij")
    return np.stack([r1, r2, r3], axis=-1)


def index_G_vectors(fft_size, G):
    """Flat cube index of integer G vectors [..., 3]; -1 if out of range.

    Matches DFTK `index_G_vectors` (PlaneWaveBasis.jl:464-494).
    """
    G = np.asarray(G)
    n = np.asarray(fft_size)
    start = -np.floor_divide(n - 1 + 1, 2)  # -cld(n-1, 2)
    stop = np.floor_divide(n - 1, 2)
    ok = np.all((G >= start) & (G <= stop), axis=-1)
    idx3 = np.mod(G, n)
    flat = (idx3[..., 0] * n[1] + idx3[..., 1]) * n[2] + idx3[..., 2]
    return np.where(ok, flat, -1)


# ---------------------------------------------------------------------------
# Cube FFTs (densities / potentials); batched over leading axes
# ---------------------------------------------------------------------------

def ifft_cube(f_fourier, unit_cell_volume):
    """Fourier cube -> real-space grid values (complex)."""
    N = f_fourier.shape[-1] * f_fourier.shape[-2] * f_fourier.shape[-3]
    scale = N / math.sqrt(unit_cell_volume)
    return jnp.fft.ifftn(f_fourier, axes=(-3, -2, -1)) * scale


def irfft_cube(f_fourier, unit_cell_volume):
    return ifft_cube(f_fourier, unit_cell_volume).real


def fft_cube(f_real, unit_cell_volume):
    """Real-space grid values -> Fourier cube."""
    N = f_real.shape[-1] * f_real.shape[-2] * f_real.shape[-3]
    scale = math.sqrt(unit_cell_volume) / N
    return jnp.fft.fftn(f_real, axes=(-3, -2, -1)) * scale


# ---------------------------------------------------------------------------
# Sphere <-> cube scatter/gather (per k-point dense index maps)
# ---------------------------------------------------------------------------

def scatter_to_cube(coeffs, Gidx, mask, fft_size):
    """Place sphere coefficients [..., nG] into a flattened cube [..., N].

    Padded entries (mask 0) carry index 0 but are zeroed before the
    scatter-add, so they contribute nothing.
    """
    N = int(np.prod(fft_size))
    c = coeffs * mask
    flat = jnp.zeros(coeffs.shape[:-1] + (N,), dtype=coeffs.dtype)
    flat = flat.at[..., Gidx].add(c, unique_indices=False)
    return flat.reshape(coeffs.shape[:-1] + tuple(fft_size))


def gather_from_cube(cube, Gidx, mask):
    """Extract sphere coefficients [..., nG] from a cube [..., n1,n2,n3]."""
    flat = cube.reshape(cube.shape[:-3] + (-1,))
    return jnp.take(flat, Gidx, axis=-1) * mask


def ifft_sphere(coeffs, Gidx, mask, fft_size, unit_cell_volume):
    """Orbital coefficients on the G-sphere -> real-space values."""
    cube = scatter_to_cube(coeffs, Gidx, mask, fft_size)
    return ifft_cube(cube, unit_cell_volume)


def fft_sphere(f_real, Gidx, mask, unit_cell_volume):
    """Real-space orbital values -> coefficients on the G-sphere."""
    cube = fft_cube(f_real, unit_cell_volume)
    return gather_from_cube(cube, Gidx, mask)


# ---------------------------------------------------------------------------
# FFT grid size selection (DFTK fft.jl:231-290)
# ---------------------------------------------------------------------------

def next_compatible_size(size, smallprimes=(2, 3, 5), factors=(1,)):
    def is_prod_of_primes(n):
        if not smallprimes:
            return True
        for p in smallprimes:
            while n % p == 0:
                n //= p
        return n == 1

    fac = int(np.prod(factors)) if factors else 1
    while not (size % fac == 0 and is_prod_of_primes(size)):
        size += 1
    return size


def compute_fft_size(lattice, Ecut, supersampling=2.0, smallprimes=(2, 3, 5),
                     factors=(1,)):
    """Minimal cube holding all G with |G|^2/2 <= supersampling^2 * Ecut,
    then rounded up to small-prime sizes containing `factors`."""
    from ..utils.lattice import compute_recip_lattice, estimate_integer_lattice_bounds
    Gmax = supersampling * math.sqrt(2 * Ecut)
    B = compute_recip_lattice(np.asarray(lattice, dtype=float))
    Glims = estimate_integer_lattice_bounds(B, Gmax)
    return tuple(next_compatible_size(2 * l + 1, smallprimes, factors) for l in Glims)
