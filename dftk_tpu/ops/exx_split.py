"""Exact (Fock) exchange in the realified split engine.

Chip path for hybrid functionals (HF/PBE0/HSE06): the same physics as the
complex-engine operator (ops/hamiltonian.py:_apply_exchange, reference
src/terms/exact_exchange.jl:68-99 and src/terms/operators.jl:184-210)
expressed on split-complex arrays (trailing axis 2 = re/im) so every device
op is real - TPU backends without complex dtype support run it natively.

Like the reference, exchange is restricted to Gamma-point-only bases
(src/terms/exact_exchange.jl:52).  The bare operator costs one full-cube
DFT round trip per generating orbital per apply; the production SCF path
compresses it once per step with ACE (Lin Lin, JCTC 12, 2242 (2016)) whose
apply is two MXU GEMMs (build_ace_split/apply_ace_split, the split analogue
of ops/exx_ace.py).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.dft_matmul import cmul, conj_split, dft3
from .eigen.csplit import cgram, crotate, ctriangular_solve_bands, \
    interleave_mat


def _xy(U):
    """Realified rows [nk, nb, 2nG] -> split pairs [nk, nb, nG, 2]."""
    nG = U.shape[-1] // 2
    return jnp.stack([U[..., :nG], U[..., nG:]], axis=-1)


def _rows(xy):
    return jnp.concatenate([xy[..., 0], xy[..., 1]], axis=-1)


def _to_real_cube(xy, Gidx, mask, fft_size, volume):
    """Split sphere coeffs -> real-space cube [nk, nb, n1,n2,n3, 2].

    Matches the complex engine's  ifftn(scatter) * N/sqrt(vol)
    == dft3(scatter, +1) / sqrt(vol).
    """
    from .engine_split import scatter_cube_split
    cube = scatter_cube_split(xy, Gidx, mask, fft_size)
    return dft3(cube, sign=+1) / math.sqrt(volume)


def apply_exchange_split(kern, U_gen, f_gen, U, Gidx, mask, fft_size, volume,
                         iq=None, kspin=None):
    """(Vx phi) on realified bands.

    kern  [n1,n2,n3]      real Fourier exchange kernel (terms.exx_kernel_np)
          at Gamma, or the [nq, n1,n2,n3] shifted-kernel stack
          (ops/coulomb.py:exx_q_kernels) with ``iq`` for k-grids
    U_gen [nk, nx, 2nG]   generating orbitals (realified, csplit repr)
    f_gen [nk, nx]        their generator weights w_k f/filled (w == 1 at
                          Gamma, so just f/filled there)
    U     [nk, nb, 2nG]   bands to act on
    iq    [nk, nk] int32  q = k - k' index map into kern, or None (Gamma:
                          exchange is k-diagonal)
    kspin [nk] int32      spin channel per k (same-spin exchange only)
    Returns [nk, nb, 2nG].

    k-grid semantics mirror the complex engine (ops/hamiltonian.py:
    _apply_exchange, beyond the reference's Gamma-only operator,
    src/terms/exact_exchange.jl:31,52): every generating orbital (k', m)
    acts on the bands of EVERY same-spin k through the kernel evaluated on
    the shifted grid G + (k - k').
    """
    from .engine_split import gather_cube_split
    N = int(np.prod(fft_size))
    phir = _to_real_cube(_xy(U), Gidx, mask, fft_size, volume)
    psir = _to_real_cube(_xy(U_gen), Gidx, mask, fft_size, volume)
    acc0 = jnp.zeros_like(phir)

    if iq is None:
        def one_orbital(acc, inp):
            psin, fn = inp                       # [nk, n1,n2,n3, 2], [nk]
            pair = cmul(conj_split(psin)[:, None], phir)      # psi_n^* phi
            pairG = dft3(pair, sign=-1)
            V = dft3(kern[..., None] * pairG, sign=+1) / N
            acc = acc - fn[:, None, None, None, None, None] \
                * cmul(psin[:, None], V)
            return acc, None

        acc, _ = jax.lax.scan(one_orbital, acc0,
                              (jnp.moveaxis(psir, 1, 0),
                               jnp.moveaxis(f_gen, 1, 0)))
    else:
        # scan over the flattened generator list (k', m); each step is
        # batched over all (k, n) - the same FFT/GEMM shapes as the Gamma
        # path, so per-generator cost is unchanged
        nk, nx = psir.shape[:2]
        gen_psi = psir.reshape((nk * nx,) + psir.shape[2:])
        gen_f = f_gen.reshape(nk * nx)
        gen_k = jnp.repeat(jnp.arange(nk, dtype=jnp.int32), nx)

        def one_generator(acc, inp):
            psin, fn, kp = inp     # [n1,n2,n3,2], scalar, int32
            vqs = kern[iq[:, kp]]                   # [nk, n1,n2,n3]
            ss = (kspin == kspin[kp]).astype(acc.dtype)
            pair = cmul(conj_split(psin)[None, None], phir)  # [nk,nb,grid,2]
            pairG = dft3(pair, sign=-1)
            V = dft3(vqs[:, None, ..., None] * pairG, sign=+1) / N
            w = fn * ss                             # [nk]
            acc = acc - w[:, None, None, None, None, None] \
                * cmul(psin[None, None], V)
            return acc, None

        acc, _ = jax.lax.scan(one_generator, acc0, (gen_psi, gen_f, gen_k))
    back = dft3(acc, sign=-1) * (math.sqrt(volume) / N)
    out = gather_cube_split(back, Gidx, mask)
    return _rows(out)


def exchange_energy_split(kern, U, f_gen, occupation, kweights, Gidx, mask,
                          fft_size, volume, iq=None, kspin=None):
    """E_x = 1/2 sum w f <psi|Vx psi> on realified bands (operator-
    consistent, mirrors ops/hamiltonian.py:exchange_energy).  f_gen is the
    generator weight w_k' occupation/filled (w == 1 at Gamma); occupation
    the physical f per csplit row."""
    vx = apply_exchange_split(kern, U, f_gen, U, Gidx, mask, fft_size,
                              volume, iq=iq, kspin=kspin)
    band_e = jnp.einsum("kng,kng->kn", U, vx)     # Re<u|vx u>
    return 0.5 * jnp.sum(kweights[:, None] * occupation * band_e)


def build_ace_split(kern, U_gen, f_gen, Gidx, mask, fft_size, volume,
                    jitter=None, iq=None, kspin=None):
    """ACE vectors Xi [nk, nx, 2nG] from realified generating orbitals.

    Same algebra as ops/exx_ace.py:build_ace through the interleaved real
    embedding: -M is PSD, chol(E(-M)) == E(chol(-M)) exactly, and
    Xi = conj(L)^{-1} W is one real triangular solve on the band axis.

    k-grids: the compression stays PER K-POINT (V_ACE,k = -Xi_k Xi_k^H
    reproduces Vx exactly on span(Psi_k) whatever generators W_k gathered),
    so the only change is that W carries the cross-k generator sum; the
    eigensolver then pays two GEMMs per matvec instead of the full
    O(nk * nx) shifted-kernel Poisson scan.
    """
    if jitter is None:
        # f32 on chip needs a larger relative ridge than the complex f64 path
        jitter = max(1e-12, 50 * float(jnp.finfo(U_gen.dtype).eps))
    W = apply_exchange_split(kern, U_gen, f_gen, U_gen, Gidx, mask, fft_size,
                             volume, iq=iq, kspin=kspin)  # Vx psi
    Mr, Mi = cgram(U_gen, W)                              # <psi_i|W_j>
    Mr = (Mr + Mr.transpose(0, 2, 1)) / 2
    Mi = (Mi - Mi.transpose(0, 2, 1)) / 2
    nx = Mr.shape[-1]
    tr = jnp.clip(-jnp.trace(Mr, axis1=1, axis2=2), 1.0, None)
    Ar = -Mr + (jitter * tr)[:, None, None] * jnp.eye(nx, dtype=Mr.dtype)
    L = jnp.linalg.cholesky(interleave_mat(Ar, -Mi))
    return ctriangular_solve_bands(L, W)


def apply_ace_split(xi, U):
    """(V_ACE phi) = -Xi (Xi^H phi): complex Gram + rotation, all real ops."""
    Gr, Gi = cgram(xi, U)                                 # [nk, nx, nb]
    return -crotate(Gr, Gi, xi)
