"""Fused local-potential apply for the compact Chebyshev filter (Pallas).

The compact filter's local chain (engine_split.apply_local_sandwich) runs
F2fwd -> transpose -> per-(z,y) sandwich -> F2bwd as separate XLA ops; the
n2-expanded intermediates ([nb, m1, n3, n2, 2] ~ 134 MB on Si54/128 bands)
make two HBM round trips, and the batched [nb, 2m1]x[2m1, 2m1] sandwich
GEMMs run at ~2.4 TF/s on v5e (tools/bench_r4_probe.py) - the whole-apply
bottleneck flagged by the round-3 verdict.

This kernel fuses the entire middle of the chain in VMEM with a grid over
z-planes (the F3-transformed axis).  Layout: BANDS RIDE THE LANE AXIS -
every contraction is a 2D-style dot of a realified DFT factor against
[2m_axis, spatial x bands] data, so the MXU sees fat-N GEMMs and the
re/im re-pairing between axes is a sublane-only permutation (Mosaic
handles those natively; lane-splitting reshapes it cannot - see
tools/probe_mosaic_ops.py).  Per (z, band-tile) cell:

    A [2, m2, m1, nbt] --repair--> [2m2, m1, nbt]
      --F2f--> [2n2, m1, nbt]                            (y -> real space)
      --repair--> [2m1, n2, nbt] --F1f--> [2n1, n2, nbt] (x -> real space)
      --*V(z)[x,y]--> --F1b--> [2m1, n2, nbt]
      --repair--> [2n2, m1, nbt] --F2b--> [2m2, m1, nbt]
      --repair--> out [2, m2, m1, nbt]

entirely on-chip: HBM sees only the z-expanded input/output slabs and an
[n1, n2] V plane per z.  The per-column sandwich matrices M(z, y) are
gone entirely (no 67 MB build + stream per apply); the pointwise V
multiply runs on the VPU against real-space values that never leave VMEM.

The kernel's in/out layout [n3, 2, m2, m1, nb] is Z-MAJOR with the re/im
pairing on z: exactly what the F3 axis transform produces when it is
written as a LEFT-factor GEMM [2n3, 2m3] @ X[2m3, m2*m1*nb].  With the
filter's resident representation kept z-major (engine_split.
compact_filter_ops use_pallas path), NO HBM transpose is needed anywhere
in the local chain - round 3's layout, which kept bands/m3 leading, paid
two full transposes of the z-expanded slab per apply.

Precision ('default' | 'tensor32' | 'highest'): 'tensor32' is the
round-3 verdict's "compensated bf16" scheme - factors pre-split into
(hi, lo) bf16 pairs, operands split on the fly, three 1-pass MXU
products (hi.hi + hi.lo + lo.hi, f32 accumulation) recovering ~2^-16
relative accuracy at half the passes of XLA's HIGHEST (6-pass) f32
lowering.  'default' is 1-pass bf16 (filter-grade), 'highest' true f32.

Reference context: this is the hot V.psi half of DFTK's fused real-space
multiply (reference src/terms/Hamiltonian.jl:137-192) for the compact-
cube-resident filter; kinetic/nonlocal stay in XLA where they fuse fine.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_bf16_np(F):
    F = np.asarray(F, np.float32)
    hi = F.astype(jnp.bfloat16)
    lo = (F - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _left_factor(F4):
    """Realified factor [m, 2, n, 2] (right-multiply form, dft_matmul.
    realified_factor) -> LEFT-multiply matrix [2n, 2m]:
    out[(n,d)] = sum_(m,c) L[(n,d),(m,c)] x[(m,c)]."""
    F = np.asarray(F4, np.float32)
    return np.transpose(F, (2, 3, 0, 1)).reshape(
        F.shape[2] * 2, F.shape[0] * 2)


def _dot_left(F, Fl, x, precision):
    """dot_general(F, x) contracting F dim 1 with x dim 0 (x may be 3D)."""
    dims = (((1,), (0,)), ((), ()))
    if precision == "highest":
        return jax.lax.dot_general(
            F, x, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    kw = dict(precision=jax.lax.Precision.DEFAULT,
              preferred_element_type=jnp.float32)
    if precision == "default":
        return jax.lax.dot_general(F, x.astype(jnp.bfloat16), dims, **kw)
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    y = jax.lax.dot_general(F, xh, dims, **kw)
    y = y + jax.lax.dot_general(Fl, xh, dims, **kw)
    y = y + jax.lax.dot_general(F, xl, dims, **kw)
    return y


def _repair(x, a, b):
    """[2a, b, nbt] -> [2b, a, nbt]: move the re/im pairing from axis a to
    axis b (sublane-only permutation; lanes stay put)."""
    nbt = x.shape[-1]
    x = x.reshape(a, 2, b, nbt)
    x = jnp.transpose(x, (2, 1, 0, 3))
    return x.reshape(2 * b, a, nbt)


def _filter_mid_kernel(a_ref, v_ref, f2f_ref, f2fl_ref, f1f_ref, f1fl_ref,
                       f1b_ref, f1bl_ref, f2b_ref, f2bl_ref, o_ref,
                       *, m1, m2, n1, n2, precision):
    nbt = a_ref.shape[-1]
    # [2, m2, m1, nbt] (re/im paired on z) -> [2m2, m1, nbt] (paired on m2)
    A = jnp.transpose(a_ref[0], (1, 0, 2, 3)).reshape(2 * m2, m1, nbt)
    B = _dot_left(f2f_ref[...], f2fl_ref[...], A, precision)   # [2n2,m1,nbt]
    Bt = _repair(B, n2, m1)                                    # [2m1,n2,nbt]
    C = _dot_left(f1f_ref[...], f1fl_ref[...], Bt, precision)  # [2n1,n2,nbt]
    Cv = C.reshape(n1, 2, n2, nbt) * v_ref[0][:, None, :, None]
    D = _dot_left(f1b_ref[...], f1bl_ref[...],
                  Cv.reshape(2 * n1, n2, nbt), precision)      # [2m1,n2,nbt]
    Dt = _repair(D, m1, n2)                                    # [2n2,m1,nbt]
    out = _dot_left(f2b_ref[...], f2bl_ref[...], Dt, precision)
    o_ref[0] = jnp.transpose(out.reshape(m2, 2, m1, nbt), (1, 0, 2, 3))


class FusedFilterFactors:
    """Precomputed left-multiply factors (f32, or bf16 hi/lo pairs).

    f2f/f1f/f1b/f2b feed the Pallas mid kernel; f3f/f3b are the z-axis
    factors for the XLA-side F3 GEMMs of the z-major resident layout."""

    def __init__(self, pf, precision="tensor32"):
        self.precision = precision
        mats = []
        for F4 in (pf.Ff[1], pf.Ff[0], pf.Fb[0], pf.Fb[1],
                   pf.Ff[2], pf.Fb[2]):
            L = _left_factor(F4)
            if precision == "highest":
                fj = jnp.asarray(L)
                mats.append((fj, fj))
            else:
                hi, lo = _split_bf16_np(L)
                mats.append((jnp.asarray(hi), jnp.asarray(lo)))
        self.f2f, self.f1f, self.f1b, self.f2b, self.f3f, self.f3b = mats
        self.m_shape = tuple(F4.shape[0] for F4 in pf.Ff)


def dot_z(factor_pair, x, precision):
    """F3 axis GEMM: [2n, 2m] x [k, 2m, a, b, nb] -> [k, 2n, a, b, nb]."""
    F, Fl = factor_pair
    k, tm, a, b, nb = x.shape
    x2 = x.reshape(k, tm, a * b * nb)
    y = jax.vmap(lambda xx: _dot_left(F, Fl, xx, precision))(x2)
    return y.reshape(k, F.shape[0], a, b, nb)


def _pick_band_tile(nb, m1, m2, n1, n2):
    """Band tile: a multiple of 128 lanes (Mosaic block requirement) whose
    live VMEM footprint stays near ~12 MB; the peak pair is C + Cv."""
    per_band = 4 * (2 * m2 * m1           # A (input block)
                    + 2 * n1 * n2 * 2     # C + Cv (the live peak)
                    + 2 * m1 * n2)        # one mid buffer
    budget = 12 * 2 ** 20
    t = max(1, budget // max(per_band, 1))
    t = max(128, (t // 128) * 128)
    return min(t, -(-nb // 128) * 128)


def fused_filter_mid(t1, V_k, factors: FusedFilterFactors, band_tile=None):
    """The fused F2f -> F1f -> V -> F1b -> F2b middle, grid over z-planes.

    t1:  [n3, 2, m2, m1, nb] f32 - F3-transformed coefficients, z leading
         with the re/im pairing ON z (dot_z output layout), bands last
         (ONE k-point; vmap over k outside).
    V_k: [n3, n1, n2] f32 local potential (z-plane leading, x, y).
    Returns [n3, 2, m2, m1, nb] f32.
    """
    n3, _, m2, m1, nb = t1.shape
    n1, n2 = V_k.shape[1], V_k.shape[2]
    prec = factors.precision

    nbt = band_tile or _pick_band_tile(nb, m1, m2, n1, n2)
    nbt = min(nbt, -(-nb // 128) * 128) if nb > 128 else nbt
    pad = (-nb) % nbt
    if pad:
        t1 = jnp.pad(t1, ((0, 0),) * 4 + ((0, pad),))
    nbp = nb + pad

    full = lambda s: pl.BlockSpec(s, lambda z, b: (0, 0),
                                  memory_space=pltpu.VMEM)
    fmats = [m for pair in (factors.f2f, factors.f1f, factors.f1b,
                            factors.f2b) for m in pair]
    fspecs = [full(m.shape) for m in fmats]

    def kern(*refs):
        _filter_mid_kernel(*refs, m1=m1, m2=m2, n1=n1, n2=n2, precision=prec)

    gf = 2 * n3 * nbp * 4 * (m2 * n2 * m1 * 2 + n2 * m1 * n1 * 2)
    out = pl.pallas_call(
        kern,
        grid=(n3, nbp // nbt),
        in_specs=[
            pl.BlockSpec((1, 2, m2, m1, nbt), lambda z, b: (z, 0, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda z, b: (z, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + fspecs,
        out_specs=pl.BlockSpec((1, 2, m2, m1, nbt),
                               lambda z, b: (z, 0, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, 2, m2, m1, nbp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=gf, bytes_accessed=2 * t1.size * 4 + V_k.size * 4,
            transcendentals=0),
    )(t1, V_k, *fmats)
    return out[..., :nb] if pad else out
