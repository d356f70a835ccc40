"""Structure-factor phases with exact f32 range reduction.

The split (chip) engine computes e^{2 pi i G.r} in the working dtype.  In
f32 the naive theta = 2 pi (G.r) loses ~|G.r| * eps_f32 in the ARGUMENT
before cos/sin even run: on a slab cell (fft_size 96 along c, |G_z| ~ 48,
z ~ 0.4) that is a 3e-5 phase error, which lands 1:1 in the chip forces
(measured 3.6e-5 on the GaAs(110) BASELINE slab vs 1e-6 target).

Because the reduced G are INTEGER vectors, the reduction G.r mod 1 can be
made exact: split r = rh + rl with rh on the 2^-11 grid (rh = round(2048 r)
/ 2048 is exact in f32 for |r| < 8).  Then every product G_i * rh_i and the
3-term sum are exact multiples of 2^-11 (for |G| < 2^13 / |r|), the mod-1
subtraction of round() is exact, and only the small G.rl ~ |G| 2^-12 term
carries rounding -- the final angle is O(1) with O(eps) error.

jnp.round has zero gradient, so d theta / d r = 2 pi G exactly as in the
naive form: jax.grad force paths are unaffected.

Reference context: structure factors in src/terms/local.jl:147-181 and
src/terms/nonlocal.jl:49-100 (the reference runs f64 and needs no care).
"""
import jax.numpy as jnp

_GRID = 2048.0


def phase_cos_sin(Gint, r, extra=None, r_lo=None):
    """(cos, sin) of 2 pi (Gint . r [+ extra]), exact range reduction.

    Gint: [..., 3] integer-valued (any float dtype); r: [3] reduced
    coordinate; extra: optional broadcastable addend (e.g. the fractional
    k . r for k+G phases -- small, needs no reduction).

    With r_lo given, the true coordinate is r + r_lo where r MUST already
    lie on the 2^-11 grid (use split_position): this removes even the f32
    QUANTIZATION of the position (~|2 pi G| * 3e-8 phase error otherwise)
    -- differentiate with respect to r_lo for exact-position forces.
    """
    if r_lo is None:
        rh = jnp.round(r * _GRID) * (1.0 / _GRID)
        rl = r - rh
    else:
        rh, rl = r, r_lo
    hi = jnp.sum(Gint * rh, axis=-1)
    hi = hi - jnp.round(hi)
    th = hi + jnp.sum(Gint * rl, axis=-1)
    if extra is not None:
        th = th + extra
    th = (2 * jnp.pi) * th
    return jnp.cos(th), jnp.sin(th)


def split_position(pos64):
    """f64 positions -> (hi, lo) numpy pair with hi on the 2^-11 grid.

    hi is exactly representable in f32; |lo| <= 2^-12 so its f32 cast
    carries the true position to ~1e-11 absolute.
    """
    import numpy as np
    pos64 = np.asarray(pos64, dtype=np.float64)
    hi = np.round(pos64 * _GRID) / _GRID
    return hi, pos64 - hi
