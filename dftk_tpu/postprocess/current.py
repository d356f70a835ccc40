"""Probability current density (reference postprocess/current.jl).

j(r) = sum_kn w_k f_kn Im( psi* grad psi )(r); nonzero only with broken
time-reversal (e.g. a Magnetic term).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fft as fftops


def compute_current(scfres, basis=None):
    """Current density [3, n1, n2, n3]."""
    basis = basis or scfres.basis
    model = basis.model
    bd = basis.data
    fft_size = basis.fft_size
    N = int(np.prod(fft_size))
    scale = N / math.sqrt(model.unit_cell_volume)
    psi = jnp.asarray(scfres.psi)
    w = bd.kweights[:, None] * jnp.asarray(scfres.occupation)

    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
        c, i, m, fft_size))(psi, bd.Gidx, bd.mask)
    psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1)) * scale
    out = []
    for a in range(3):
        da = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
            c, i, m, fft_size))(1j * bd.Gpk_cart[:, None, :, a] * psi,
                                bd.Gidx, bd.mask)
        dpsir = jnp.fft.ifftn(da, axes=(-3, -2, -1)) * scale
        ja = jnp.einsum("kn,knxyz->xyz", w,
                        jnp.imag(psir.conj() * dpsir))
        out.append(ja)
    return np.asarray(jnp.stack(out))
