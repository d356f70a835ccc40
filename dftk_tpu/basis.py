"""PlaneWaveBasis: discretization of a Model at a kinetic cutoff Ecut.

The TPU-native counterpart of DFTK's `PlaneWaveBasis` (PlaneWaveBasis.jl:25-369)
+ `Kpoint` (Kpoint.jl:6-74): instead of per-k ragged G-vector lists it builds
ONE dense, padded representation so every downstream computation is a fixed-
shape batched array op:

    psi[nk, n_bands, nG_max]   (complex)       - Bloch coefficients
    Gidx[nk, nG_max]  (int32)                  - flat cube index per sphere pt
    mask[nk, nG_max]  (float)                  - 1 real / 0 padding
    kin [nk, nG_max]  (float)                  - |k+G|^2 / 2 (0 on padding)

nG_max is the max sphere size over k-points rounded up to a lane multiple.
Collinear spin duplicates the k-point list (spin sigma in kspin[nk]), exactly
the reference's layout (Kpoint.jl:58-74) - so spin parallelism rides the same
mesh axis as k parallelism.

All index/mask construction happens host-side in numpy; `basis.data` is the
device-resident pytree consumed by jitted compute.
"""
import dataclasses
import math
from functools import cached_property
from typing import Any, NamedTuple, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .bzmesh import as_kgrid
from .models.model import Model
from .ops import fft as fftops
from .symmetry import (SymOp, symmetries_preserving_kgrid,
                       symmetries_preserving_rgrid)

LANE = 128  # pad nG to a multiple of this for TPU-friendly layouts


class BasisData(NamedTuple):
    """Device-resident static arrays of the discretization (a jit-able pytree)."""
    Gidx: Any        # [nk, nG] int32 flat cube indices
    mask: Any        # [nk, nG] float validity
    kin: Any         # [nk, nG] kinetic energies |k+G|^2/2 (masked)
    Gpk_cart: Any    # [nk, nG, 3] Cartesian k+G
    kweights: Any    # [nk]
    kspin: Any       # [nk] int32 spin component index (0 or 1)


@dataclasses.dataclass
class PlaneWaveBasis:
    model: Model
    Ecut: float
    kgrid: Any = None
    fft_size: Optional[tuple] = None
    variational: bool = True
    symmetries_respect_rgrid: Optional[bool] = None
    use_symmetries_for_kpoint_reduction: bool = True

    def __post_init__(self):
        from .config import maybe_enable_compile_cache
        maybe_enable_compile_cache()   # resolved-backend-aware, once
        model = self.model
        self.kgrid = as_kgrid(self.kgrid if self.kgrid is not None else (1, 1, 1))
        if self.symmetries_respect_rgrid is None:
            # match the reference default (PlaneWaveBasis.jl:329): only filter
            # by the r-grid when we get to choose the fft size ourselves
            self.symmetries_respect_rgrid = self.fft_size is None

        # --- k-points: IBZ reduction with the model symmetries ---------------
        # Only ops mapping the full (reducible) k-grid onto itself may be used
        # for the reduction; this matters for shifted Monkhorst-Pack meshes
        # (mirrors spglib's stabilized-mesh behaviour in the reference).
        if self.use_symmetries_for_kpoint_reduction:
            ksym = symmetries_preserving_kgrid(
                model.symmetries, self.kgrid.reducible_kcoords(), unfold=False)
        else:
            ksym = [SymOp.identity()]
        kcoords, kweights = self.kgrid.irreducible_kcoords(ksym)
        self.kcoords = np.asarray(kcoords, dtype=float)
        self.kweights_irr = np.asarray(kweights, dtype=float)
        assert abs(self.kweights_irr.sum() - 1.0) < 1e-12

        # --- fft size --------------------------------------------------------
        if self.fft_size is None:
            factors = (1,)
            if self.symmetries_respect_rgrid:
                # grid must represent all fractional translations exactly
                denoms = [_rational_denominator(w) for op in model.symmetries
                          for w in op.w]
                factors = (int(np.lcm.reduce(denoms)),) if denoms else (1,)
            self.fft_size = fftops.compute_fft_size(model.lattice, self.Ecut,
                                                    factors=factors)
        self.fft_size = tuple(int(n) for n in self.fft_size)

        # --- symmetries usable on this basis ----------------------------------
        syms = model.symmetries
        if self.symmetries_respect_rgrid:
            syms = symmetries_preserving_rgrid(syms, self.fft_size)
        syms = symmetries_preserving_kgrid(syms, self.kcoords)
        self.symmetries = syms

        # --- spin doubling of the k-point list --------------------------------
        nspin = model.n_spin_components
        nk_irr = len(self.kcoords)
        self.kcoords_spin = np.tile(self.kcoords, (nspin, 1))
        self.kweights = np.tile(self.kweights_irr, nspin)
        self.kspin = np.repeat(np.arange(nspin), nk_irr).astype(np.int32)
        self.n_kpoints = nk_irr * nspin
        self.n_irreducible_kpoints = nk_irr

        # --- G-vector spheres --------------------------------------------------
        self._build_spheres()

        # --- geometry helpers ---------------------------------------------------
        self.dvol = model.unit_cell_volume / np.prod(self.fft_size)
        self.r_cube = fftops.r_vectors(self.fft_size)          # fractional [n1,n2,n3,3]
        self.G_cube = fftops.G_vectors_cube(self.fft_size)     # integer    [n1,n2,n3,3]
        B = model.recip_lattice
        self.G_cube_cart = np.einsum("ab,xyzb->xyza", B, self.G_cube.astype(float))

        # --- device bundle -------------------------------------------------------
        self.data = BasisData(
            Gidx=jnp.asarray(self.Gidx_np),
            mask=jnp.asarray(self.mask_np),
            kin=jnp.asarray(self.kin_np),
            Gpk_cart=jnp.asarray(self.Gpk_cart_np),
            kweights=jnp.asarray(self.kweights),
            kspin=jnp.asarray(self.kspin),
        )

        # --- instantiate terms -----------------------------------------------------
        from .ops.terms import instantiate_terms
        self.terms = instantiate_terms(self)

        # whole-suite mesh mode (DFTK_TPU_MESH=N): shard every basis over a
        # k-point device mesh, the analogue of the reference re-running its
        # entire suite under mpiexec (test/runtests.jl:26-33)
        from .parallel.mesh import maybe_auto_distribute
        maybe_auto_distribute(self)

    # -------------------------------------------------------------------------
    def _build_spheres(self):
        model = self.model
        fft_size = self.fft_size
        Gcube = fftops.G_vectors_cube(fft_size).reshape(-1, 3)   # [N,3] int
        B = model.recip_lattice

        sel_list, nG_list = [], []
        for k in self.kcoords_spin:
            Gpk = (Gcube + k) @ B.T
            ekin = 0.5 * np.einsum("na,na->n", Gpk, Gpk)
            if self.variational:
                sel = np.nonzero(ekin <= self.Ecut)[0]
            else:
                sel = np.arange(Gcube.shape[0])
            sel_list.append(sel)
            nG_list.append(len(sel))

        self.nG_per_k = np.array(nG_list)
        nG_max = int(self.nG_per_k.max())
        nG_max = ((nG_max + LANE - 1) // LANE) * LANE
        self.nG_max = nG_max

        nk = self.n_kpoints
        Gidx = np.zeros((nk, nG_max), dtype=np.int32)
        mask = np.zeros((nk, nG_max), dtype=np.float64)
        Gred = np.zeros((nk, nG_max, 3), dtype=np.int64)
        Gpk_cart = np.zeros((nk, nG_max, 3), dtype=np.float64)
        for ik, sel in enumerate(sel_list):
            n = len(sel)
            Gidx[ik, :n] = sel
            mask[ik, :n] = 1.0
            Gred[ik, :n] = Gcube[sel]
            Gpk_cart[ik, :n] = (Gcube[sel] + self.kcoords_spin[ik]) @ B.T

        kin = 0.5 * np.einsum("kna,kna->kn", Gpk_cart, Gpk_cart) * mask
        self.Gidx_np = Gidx
        self.mask_np = mask
        self.Gred_np = Gred
        self.Gpk_cart_np = Gpk_cart
        self.kin_np = kin

    def __repr__(self):
        return (f"PlaneWaveBasis(Ecut={self.Ecut}, fft_size={self.fft_size}, "
                f"n_kpoints={self.n_kpoints} (irr {self.n_irreducible_kpoints}), "
                f"nG_max={self.nG_max}, n_symmetries={len(self.symmetries)})")

    # -------------------------------------------------------------------------
    # FFT helpers bound to this basis (jnp, batched over leading axes)
    # -------------------------------------------------------------------------
    def ifft_cube(self, f_fourier):
        return fftops.ifft_cube(f_fourier, self.model.unit_cell_volume)

    def irfft_cube(self, f_fourier):
        return fftops.irfft_cube(f_fourier, self.model.unit_cell_volume)

    def fft_cube(self, f_real):
        return fftops.fft_cube(f_real, self.model.unit_cell_volume)

    def ifft_sphere(self, ik, coeffs):
        return fftops.ifft_sphere(coeffs, self.data.Gidx[ik], self.data.mask[ik],
                                  self.fft_size, self.model.unit_cell_volume)

    def fft_sphere(self, ik, f_real):
        return fftops.fft_sphere(f_real, self.data.Gidx[ik], self.data.mask[ik],
                                 self.model.unit_cell_volume)

    # -------------------------------------------------------------------------
    @cached_property
    def G_cube_cart_norm(self):
        return np.linalg.norm(self.G_cube_cart, axis=-1)

    def weighted_ksum(self, arr):
        """Sum over k with BZ weights (arr leading axis nk)."""
        w = self.kweights.reshape((-1,) + (1,) * (np.ndim(arr) - 1))
        return np.sum(w * arr, axis=0)


def _rational_denominator(x, max_den=48, tol=1e-6):
    from fractions import Fraction
    return Fraction(float(x)).limit_denominator(max_den).denominator
