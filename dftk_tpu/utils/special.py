"""Special functions: real solid/spherical harmonics (vectorised, jnp).

Real solid harmonics R_l^m(r) = r^l Y_l^m(r/|r|) for l <= 3, matching the
Wikipedia real-spherical-harmonics table (same convention as the reference,
DFTK `src/common/spherical_harmonics.jl:31-66`).  Being homogeneous
polynomials they are smooth at the origin, which is what the Kleinman-
Bylander projector form factors need (the radial part divides out p^l).

Vectorised over leading axes: input [..., 3] -> output [..., (lmax+1)^2]
with flat index  i = l^2 + (l + m).
"""
import numpy as np
import jax.numpy as jnp

LM_INDEX = {(l, m): l * l + l + m for l in range(4) for m in range(-l, l + 1)}


def solid_harmonics_real(rvec, lmax):
    """All real solid harmonics up to lmax, stacked on the last axis.

    rvec: array [..., 3] (any real dtype); returns [..., (lmax+1)^2].
    """
    if lmax > 3:
        raise NotImplementedError("solid harmonics only implemented for l <= 3")
    xp = jnp if not isinstance(rvec, np.ndarray) else np
    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    pi = np.pi
    out = [xp.full(x.shape, np.sqrt(1 / (4 * pi)), dtype=x.dtype) if hasattr(x, 'shape')
           else np.sqrt(1 / (4 * pi))]
    if lmax >= 1:
        c1 = np.sqrt(3 / (4 * pi))
        out += [c1 * y, c1 * z, c1 * x]
    if lmax >= 2:
        out += [
            np.sqrt(15 / (4 * pi)) * x * y,
            np.sqrt(15 / (4 * pi)) * y * z,
            np.sqrt(5 / (16 * pi)) * (2 * z**2 - x**2 - y**2),
            np.sqrt(15 / (4 * pi)) * x * z,
            np.sqrt(15 / (16 * pi)) * (x**2 - y**2),
        ]
    if lmax >= 3:
        out += [
            np.sqrt(35 / (32 * pi)) * (3 * x**2 - y**2) * y,
            np.sqrt(105 / (4 * pi)) * x * y * z,
            np.sqrt(21 / (32 * pi)) * y * (4 * z**2 - x**2 - y**2),
            np.sqrt(7 / (16 * pi)) * z * (2 * z**2 - 3 * x**2 - 3 * y**2),
            np.sqrt(21 / (32 * pi)) * x * (4 * z**2 - x**2 - y**2),
            np.sqrt(105 / (16 * pi)) * (x**2 - y**2) * z,
            np.sqrt(35 / (32 * pi)) * (x**2 - 3 * y**2) * x,
        ]
    return xp.stack(out, axis=-1)


def ylm_real(l, m, rvec):
    """Single real spherical harmonic Y_l^m at a unit (or general) vector."""
    rvec = np.asarray(rvec, dtype=float)
    r = np.linalg.norm(rvec)
    if l == 0:
        return np.sqrt(1 / (4 * np.pi))
    if r < 10 * np.finfo(float).eps:
        return 0.0
    vals = solid_harmonics_real(rvec / r, l)
    return float(vals[..., LM_INDEX[(l, m)]])
