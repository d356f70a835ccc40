"""Energy terms and their instantiation on a PlaneWaveBasis.

The reference's terms layer (DFTK `src/terms/*.jl`) builds, per term, one
`RealFourierOperator` per k-point.  TPU-native redesign: instantiation
precomputes *dense static arrays* bundled in a single `TermsData` pytree; the
Hamiltonian apply is then one fused batched function over all k-points
(`ops/hamiltonian.py`) instead of per-k operator objects.

Builders (stored in Model.term_types):
  Kinetic, AtomicLocal, AtomicNonlocal, Hartree, Xc, Ewald, PspCorrection,
  Entropy, ExternalFromReal, ExternalFromFourier, LocalNonlinearity.

Density-dependent potentials (Hartree, Xc, LocalNonlinearity) are assembled
each SCF step in `total_potential`; density-independent ones are baked into
`TermsData` at setup.
"""
import dataclasses
import math
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.elements import ElementPsp
from ..utils.special import solid_harmonics_real, LM_INDEX
from . import fft as fftops
from .ewald import default_eta, energy_forces_ewald
from .xc.functionals import Functional, resolve_functionals


# ---------------------------------------------------------------------------
# Term builder specs (what goes into Model.term_types)
# ---------------------------------------------------------------------------

class BlowupIdentity:
    """Standard kinetic energies (no Ecut smearing)."""
    def __call__(self, x, Ecut):
        return np.ones_like(x)


class BlowupCHV:
    """C^2-regular energy-band blow-up of Cances/Hassan/Vidal
    (arXiv:2210.00442); same construction as the reference
    terms/kinetic.jl:72-91."""
    def __call__(self, y, Ecut):
        y = np.asarray(y, dtype=float)
        x = y / np.sqrt(2 * Ecut)
        x1, x2 = 0.85, 0.90
        Ca = 0.013952310177257383

        def f(t):
            return np.where(t <= 0, 0.0, np.exp(-1 / np.maximum(t, 1e-300)))

        t = (x - x1) / (x2 - x1)
        sstep = f(t) / (f(t) + f(1 - t))
        blow = Ca / np.maximum((1 - x) ** 2, 1e-300)
        Ekin = np.maximum(y ** 2 / 2, 1e-300)
        mid = (Ecut / Ekin) * ((1 - sstep) * x ** 2 + sstep * blow)
        hi = (Ecut / Ekin) * blow
        return np.where(x < x1, 1.0, np.where(x < x2, mid, hi))


class BlowupAbinit:
    """Abinit-style Ecut smearing (terms/kinetic.jl:97-111)."""
    def __init__(self, Ecutsm=0.5):
        self.Ecutsm = Ecutsm

    def __call__(self, y, Ecut):
        y = np.asarray(y, dtype=float)
        Ekin = y ** 2 / 2
        Ecutsm = Ecut * self.Ecutsm
        x = (Ecut - Ekin) / Ecutsm
        xs = np.maximum(x, 1e-10)
        smoothed = 1 / (xs ** 2 * (3 + xs - 6 * xs ** 2 + 3 * xs ** 3))
        return np.where(Ekin <= Ecut - Ecutsm, 1.0, smoothed)


@dataclasses.dataclass(frozen=True)
class Kinetic:
    scaling_factor: float = 1.0
    blowup: object = None      # BlowupIdentity / BlowupCHV / BlowupAbinit


@dataclasses.dataclass(frozen=True)
class AtomicLocal:
    pass


@dataclasses.dataclass(frozen=True)
class AtomicNonlocal:
    pass


@dataclasses.dataclass(frozen=True)
class Hartree:
    scaling_factor: float = 1.0


@dataclasses.dataclass(frozen=True)
class Xc:
    functionals: tuple = ()
    scaling_factor: float = 1.0

    def __init__(self, functionals=(), scaling_factor=1.0):
        if isinstance(functionals, str):
            functionals = (functionals,)
        object.__setattr__(self, "functionals", tuple(functionals))
        object.__setattr__(self, "scaling_factor", float(scaling_factor))


@dataclasses.dataclass(frozen=True)
class Ewald:
    eta: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class PspCorrection:
    pass


@dataclasses.dataclass(frozen=True)
class Entropy:
    pass


@dataclasses.dataclass(frozen=True)
class ExternalFromReal:
    """potential(r_cart) -> V; evaluated on the real-space grid at setup."""
    potential: Callable = None


@dataclasses.dataclass(frozen=True)
class ExternalFromFourier:
    """potential(G_cart) -> V(G) (unnormalised); iFFT'd at setup."""
    potential: Callable = None


@dataclasses.dataclass(frozen=True)
class ExternalFromValues:
    """External potential given as precomputed real-space grid values
    (shape == basis.fft_size); the array-valued sibling of ExternalFromReal
    (reference src/terms/local.jl:26-39)."""
    potential_values: Any = None


@dataclasses.dataclass(frozen=True)
class LocalNonlinearity:
    """Energy term  int f(rho)  (e.g. Gross-Pitaevskii C rho^alpha)."""
    f: Callable = None


@dataclasses.dataclass(frozen=True)
class Magnetic:
    """A.(-i grad) vector-potential term (reference terms/magnetic.jl):
    Apot(r_cart) -> [3] vector potential (symmetric gauge helper below).
    Breaks time-reversal symmetry; use symmetries=False."""
    Apot: Callable = None


@dataclasses.dataclass(frozen=True)
class Hubbard:
    """DFT+U on pseudo-atomic orbital manifolds (ops/hubbard.py);
    manifolds: tuple of HubbardManifold."""
    manifolds: tuple = ()


@dataclasses.dataclass(frozen=True)
class ExactExchange:
    """(Screened) Hartree-Fock exchange (reference terms/exact_exchange.jl):
    E = -1/2 sum_nm (f_n f_m / filled) <nm|kernel|mn>, kernel from
    ops/coulomb.py.  Works at Gamma (the reference's only mode,
    exact_exchange.jl:52) AND on unreduced uniform k-point grids
    (symmetries=False) via shifted G+q kernels -- the k-point
    generalisation the reference names a TODO (exact_exchange.jl:31);
    complex driver only, validated by exact supercell folding
    (tests/test_exx_kgrid.py)."""
    scaling_factor: float = 1.0
    kernel: object = None


@dataclasses.dataclass(frozen=True)
class Anyonic:
    """Average-field anyons in 2D (reference terms/anyonic.jl;
    arXiv:1901.10739): a density-dependent Chern-Simons gauge field.
    Use with Kinetic(scaling_factor=2) and direct_minimization, like the
    reference example (examples/anyons.jl); ops/anyonic.py has the
    physics.  Requires Gamma-only, n_dim == 2, square lattice, nspin 1."""
    hbar: float = 1.0
    beta: float = 0.0


@dataclasses.dataclass(frozen=True)
class PairwisePotential:
    """Classical pairwise interaction sum_{i<j,R} V(|ri - rj - R|)
    (reference terms/pairwise.jl), e.g. Lennard-Jones between nuclei.
    V(d2) takes the SQUARED distance (autodiff-smooth); params per
    species-pair key (symA, symB) sorted."""
    V: Callable = None
    params: dict = None
    max_radius: float = 100.0


# ---------------------------------------------------------------------------
# Instantiated terms: one device pytree + static metadata
# ---------------------------------------------------------------------------

class TermsData(NamedTuple):
    """Device arrays consumed by the jitted SCF step / H apply."""
    vloc_static: Any      # [n1,n2,n3] spin-independent static local potential
    hartree_coeffs: Any   # [n1,n2,n3] 4 pi / |G|^2 (0 at DC), scaled
    P: Any                # [nk, nG, nproj] complex projector vectors (or [nk,nG,0])
    D: Any                # [nproj, nproj] coupling coefficients
    Gsq_cart: Any         # [n1,n2,n3] |G|^2 Cartesian (for Kerker & kernels)
    kinetic_scale: Any    # scalar
    kin: Any = None       # [nk, nG] blow-up kinetic override (or None)
    Apot: Any = None      # [n1,n2,n3,3] vector potential (Magnetic), or None


@dataclasses.dataclass
class Terms:
    """Static info (host numpy) + lazily-created device TermsData."""
    vloc_np: np.ndarray
    hartree_np: np.ndarray
    P_np: Optional[np.ndarray]       # [nk, nG, nproj] complex or None
    D_np: Optional[np.ndarray]
    Gsq_np: np.ndarray
    kinetic_scale: float
    rho_core_np: Optional[np.ndarray]    # NLCC core density on the grid
    tau_core_np: Optional[np.ndarray]    # NLCC core kinetic density (mGGA)
    kin_np: Optional[np.ndarray]         # kinetic override (blow-up), or None
    exx_kernel_np: Optional[np.ndarray]  # [nq, n1,n2,n3] exchange kernels at
                                         # G+q for the k-difference set
                                         # (nq == 1 at Gamma), or None
    exx_iq_np: Optional[np.ndarray]      # [nk, nk] int32 q index map, or None
    hubbard_manifolds: Optional[tuple]
    anyonic: Optional[tuple]             # (hbar, beta, rho_ref, Aref) or None
    Apot_np: Optional[np.ndarray]        # [n1,n2,n3,3] vector potential
    E_pairwise: float
    pairwise_forces: Optional[np.ndarray]
    E_ewald: float
    E_psp_correction: float
    xc: Sequence[Functional]
    xc_scaling: float
    has_entropy: bool
    has_nonlocal: bool
    hartree_scaling: float
    local_nonlinearity: Optional[Callable]
    ewald_forces: Optional[np.ndarray]   # reduced coords, [na,3]
    _data: Optional[TermsData] = None

    @property
    def data(self) -> TermsData:
        """Device arrays for the complex engine (created on first use)."""
        if self._data is None:
            # materialise as concrete device arrays even if first touched
            # inside a jit trace (the cache must never hold tracers)
            with jax.ensure_compile_time_eval():
                self._materialize()
        return self._data

    def _materialize(self):
        P = self.P_np
        if P is None:
            P = np.zeros(self._pshape0 + (0,), dtype=np.complex128)
            D = np.zeros((0, 0))
        else:
            D = self.D_np
        self._data = TermsData(
            vloc_static=jnp.asarray(self.vloc_np),
            hartree_coeffs=jnp.asarray(self.hartree_np),
            P=jnp.asarray(P), D=jnp.asarray(D),
            Gsq_cart=jnp.asarray(self.Gsq_np),
            kinetic_scale=jnp.asarray(self.kinetic_scale),
            kin=(None if self.kin_np is None else jnp.asarray(self.kin_np)),
            Apot=(None if self.Apot_np is None
                  else jnp.asarray(self.Apot_np)))


def instantiate_terms(basis) -> Terms:
    model = basis.model
    fft_size = basis.fft_size
    types = list(model.term_types)

    vloc = np.zeros(fft_size, dtype=np.float64)
    hartree_coeffs = np.zeros(fft_size)
    hartree_scaling = 0.0
    P = None
    D = None
    E_ewald = 0.0
    ewald_forces = None
    E_psp = 0.0
    xc_functionals: Sequence[Functional] = []
    xc_scaling = 1.0
    has_entropy = False
    kinetic_scale = 1.0
    local_nonlinearity = None
    rho_core = None
    tau_core = None

    Gsq = basis.G_cube_cart_norm ** 2

    kin_np = None
    E_pairwise = 0.0
    pairwise_forces = None
    exx_kernel = None
    exx_iq = None
    hubbard_manifolds = None
    anyonic = None
    Apot_np = None
    for term in types:
        if isinstance(term, Kinetic):
            kinetic_scale = term.scaling_factor
            has_blowup = term.blowup is not None and not isinstance(
                term.blowup, BlowupIdentity)
            # materialize the explicit [nk, nG] kinetic whenever it differs
            # from the bare 0.5|k+G|^2 -- the split engine reads THIS (it has
            # no separate scale factor), the complex engine prefers it too
            if has_blowup or term.scaling_factor != 1.0:
                pk = np.linalg.norm(basis.Gpk_cart_np, axis=-1)
                blow = term.blowup(pk, basis.Ecut) if has_blowup else 1.0
                kin_np = (term.scaling_factor * 0.5 * pk ** 2
                          * blow) * basis.mask_np
        elif isinstance(term, Magnetic):
            r_cart = np.einsum("ab,xyzb->xyza", model.lattice, basis.r_cube)
            Apot_np = np.asarray(term.Apot(r_cart), dtype=np.float64)
            assert Apot_np.shape == basis.fft_size + (3,)
        elif isinstance(term, Hubbard):
            hubbard_manifolds = tuple(term.manifolds)
        elif isinstance(term, Anyonic):
            from .anyonic import make_div_free, reference_fields
            assert model.n_dim == 2, "Anyonic requires a 2D lattice"
            assert model.n_spin_components == 1
            assert model.lattice[0, 1] == model.lattice[1, 0] == 0 and \
                model.lattice[0, 0] == model.lattice[1, 1], \
                "Anyonic requires a square lattice (anyonic.jl:71-75)"
            rho_ref, Aref = reference_fields(model.lattice, basis.fft_size,
                                             model.n_electrons)
            Aref = make_div_free(Aref, basis.G_cube_cart)
            anyonic = (float(term.hbar), float(term.beta), rho_ref, Aref)
        elif isinstance(term, ExactExchange):
            # kernels for every k-difference q = k - k' (exx_q_kernels;
            # nq == 1 cube at Gamma, identical to the reference's
            # Gamma-only kernel); k-grid exchange sums generators over the
            # full same-spin k' list with these shifted kernels
            from .coulomb import Coulomb as _Coulomb, exx_q_kernels
            kern = term.kernel if term.kernel is not None else _Coulomb()
            vq, exx_iq = exx_q_kernels(kern, basis)
            exx_kernel = term.scaling_factor * vq
        elif isinstance(term, PairwisePotential):
            from .pairwise import energy_forces_pairwise
            E_pw, F_pw = energy_forces_pairwise(
                model.lattice, model.atoms, np.stack(model.positions),
                term.V, term.params, max_radius=term.max_radius)
            E_pairwise = float(E_pw)
            pairwise_forces = np.asarray(F_pw)
        elif isinstance(term, AtomicLocal):
            vloc += _atomic_local_potential(basis)
        elif isinstance(term, ExternalFromReal):
            r_cart = np.einsum("ab,xyzb->xyza", model.lattice, basis.r_cube)
            vloc += np.asarray(term.potential(r_cart), dtype=np.float64)
        elif isinstance(term, ExternalFromValues):
            vals = np.asarray(term.potential_values, dtype=np.float64)
            if vals.shape != tuple(basis.fft_size):
                raise ValueError(
                    f"ExternalFromValues shape {vals.shape} != fft_size "
                    f"{tuple(basis.fft_size)}")
            vloc += vals
        elif isinstance(term, ExternalFromFourier):
            pot_G = np.asarray(term.potential(basis.G_cube_cart),
                               dtype=np.complex128) / math.sqrt(model.unit_cell_volume)
            N = np.prod(basis.fft_size)
            vloc += np.fft.ifftn(pot_G).real * (N / math.sqrt(model.unit_cell_volume))
        elif isinstance(term, AtomicNonlocal):
            P, D = _build_nonlocal_projectors(basis)
        elif isinstance(term, Hartree):
            hartree_scaling = term.scaling_factor
            coeffs = np.where(Gsq > 0, 4 * math.pi / np.where(Gsq > 0, Gsq, 1.0), 0.0)
            hartree_coeffs = term.scaling_factor * coeffs
        elif isinstance(term, Xc):
            xc_functionals = resolve_functionals(term.functionals)
            xc_scaling = term.scaling_factor
            rho_core = _core_density_superposition(basis)
            if any(f.family == "mgga" for f, _ in xc_functionals):
                tau_core = _core_tau_superposition(basis)
        elif isinstance(term, Ewald):
            charges = np.array([at.charge_ionic() for at in model.atoms], dtype=float)
            if len(charges) > 0:
                eta = term.eta or default_eta(model.lattice)
                # setup-time electrostatics in f64 on the host CPU backend
                with jax.default_device(jax.local_devices(backend="cpu")[0]):
                    E, F = energy_forces_ewald(model.lattice, charges,
                                               np.stack(model.positions), eta=eta)
                    E_ewald = float(E)
                    ewald_forces = np.asarray(jax.device_get(F))
        elif isinstance(term, PspCorrection):
            E_psp = _energy_psp_correction(model)
        elif isinstance(term, Entropy):
            has_entropy = True
        elif isinstance(term, LocalNonlinearity):
            local_nonlinearity = term.f
        else:
            raise NotImplementedError(f"Term {term} not implemented yet")

    has_nonlocal = P is not None
    terms = Terms(vloc_np=vloc, hartree_np=hartree_coeffs,
                  P_np=P, D_np=D, Gsq_np=Gsq,
                  kinetic_scale=float(kinetic_scale),
                  rho_core_np=rho_core, tau_core_np=tau_core,
                  kin_np=kin_np, exx_kernel_np=exx_kernel,
                  exx_iq_np=exx_iq, anyonic=anyonic,
                  hubbard_manifolds=hubbard_manifolds,
                  Apot_np=Apot_np,
                  E_pairwise=E_pairwise,
                  pairwise_forces=pairwise_forces,
                  E_ewald=E_ewald, E_psp_correction=E_psp,
                  xc=xc_functionals, xc_scaling=xc_scaling,
                  has_entropy=has_entropy, has_nonlocal=has_nonlocal,
                  hartree_scaling=hartree_scaling,
                  local_nonlinearity=local_nonlinearity,
                  ewald_forces=ewald_forces)
    terms._pshape0 = (basis.n_kpoints, basis.nG_max)
    return terms


# ---------------------------------------------------------------------------
# Atomic local potential: form factors x structure factors (terms/local.jl:108-140)
# ---------------------------------------------------------------------------

def _atomic_local_potential(basis, positions=None):
    model = basis.model
    if positions is None:
        positions = model.positions
    Gnorm = basis.G_cube_cart_norm.reshape(-1)                  # [N]
    Gred = basis.G_cube.reshape(-1, 3).astype(float)            # [N,3]
    pot = np.zeros(Gnorm.shape, dtype=np.complex128)
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if not hasattr(el, "local_potential_fourier"):
            continue
        ff = np.asarray(el.local_potential_fourier(Gnorm))      # [N]
        sf = np.zeros(Gnorm.shape, dtype=np.complex128)
        for idx in group:
            phase = -2 * math.pi * (Gred @ np.asarray(positions[idx]))
            sf += np.exp(1j * phase)
        pot += ff * sf
    pot /= math.sqrt(model.unit_cell_volume)
    # host-side numpy iFFT (setup runs off-device; some TPU backends lack FFT)
    N = np.prod(basis.fft_size)
    return np.fft.ifftn(pot.reshape(basis.fft_size)).real \
        * (N / math.sqrt(model.unit_cell_volume))


# ---------------------------------------------------------------------------
# Nonlocal projectors (terms/nonlocal.jl:166-244)
# ---------------------------------------------------------------------------

def count_n_proj(psp):
    return psp.n_proj()


def _build_nonlocal_projectors(basis):
    """P[nk, nG, nproj] with  P[:, :, a] = ff * sf / sqrt(Omega),  D block diag.

    Projector ordering per atom: l ascending, then m, then radial index i
    (the D blocks are h[l] for every (l, m)).
    """
    model = basis.model
    psp_groups = [g for g in model.atom_groups
                  if isinstance(model.atoms[g[0]], ElementPsp)]
    if not psp_groups:
        return None, None

    n_proj = sum(count_n_proj(model.atoms[g[0]].psp) * len(g) for g in psp_groups)
    nk, nGmax = basis.n_kpoints, basis.nG_max

    P = np.zeros((nk, nGmax, n_proj), dtype=np.complex128)
    D = np.zeros((n_proj, n_proj), dtype=np.float64)
    sqrt_vol = math.sqrt(model.unit_cell_volume)

    Gpk = basis.Gpk_cart_np                  # [nk, nG, 3]
    Gpk_norm = np.linalg.norm(Gpk, axis=-1)
    Gred_pk = basis.Gred_np + basis.kcoords_spin[:, None, :]   # reduced k+G

    offset = 0
    for group in psp_groups:
        el = model.atoms[group[0]]
        psp = el.psp
        lmax = psp.lmax
        # angular parts: solid harmonics of the full (k+G) vectors
        Y = solid_harmonics_real(Gpk, lmax)  # [nk, nG, (lmax+1)^2]

        # radial parts per (l, i)
        radial = {}
        for l in range(lmax + 1):
            for i in range(1, psp.n_proj_radial(l) + 1):
                radial[(l, i)] = psp.projector_fourier(i, l, Gpk_norm)

        np_atom = count_n_proj(psp)
        for atom_idx in group:
            r = np.asarray(model.positions[atom_idx])
            sf = np.exp(-2j * math.pi * (Gred_pk @ r))          # [nk, nG]
            col = offset
            for l in range(lmax + 1):
                il_factor = (-1j) ** l
                nproj_l = psp.n_proj_radial(l)
                h = np.array(psp.h[l]) if nproj_l else None
                for m in range(-l, l + 1):
                    ylm = Y[..., LM_INDEX[(l, m)]]
                    for i in range(1, nproj_l + 1):
                        P[:, :, col] = (sf * radial[(l, i)] * il_factor * ylm
                                        / sqrt_vol)
                        col += 1
                    # coupling block for this (l, m)
                    blk = slice(col - nproj_l, col)
                    D[blk, blk] = h
            assert col - offset == np_atom
            offset += np_atom
    assert offset == n_proj

    P *= basis.mask_np[:, :, None]
    return P, D


# ---------------------------------------------------------------------------
# PspCorrection (terms/psp_correction.jl:26-35)
# ---------------------------------------------------------------------------

def _atomic_superposition(basis, has_attr, fourier_attr):
    """Superposition of per-atom radial densities on the real grid, or None
    if no atom provides the quantity (reference atomic_total_density,
    src/density_methods.jl:117-121)."""
    model = basis.model
    if not any(getattr(at, has_attr, lambda: False)() for at in model.atoms):
        return None
    Gnorm = basis.G_cube_cart_norm.reshape(-1)
    Gred = basis.G_cube.reshape(-1, 3).astype(float)
    rho_G = np.zeros(Gnorm.shape, dtype=np.complex128)
    ff_cache = {}
    for i, at in enumerate(model.atoms):
        if not getattr(at, has_attr, lambda: False)():
            continue
        if at not in ff_cache:
            ff_cache[at] = np.asarray(getattr(at, fourier_attr)(Gnorm))
        phase = np.exp(-2j * math.pi * (Gred @ np.asarray(model.positions[i])))
        rho_G += ff_cache[at] * phase
    rho_G /= math.sqrt(model.unit_cell_volume)
    N = np.prod(basis.fft_size)
    rho = np.fft.ifftn(rho_G.reshape(basis.fft_size)).real \
        * (N / math.sqrt(model.unit_cell_volume))
    return np.maximum(rho, 0.0)


def _core_density_superposition(basis):
    """NLCC: superposition of pseudo core charge densities (real grid)."""
    return _atomic_superposition(basis, "has_core_density",
                                 "core_density_fourier")


def _core_tau_superposition(basis):
    """NLCC for mGGA: superposition of core kinetic-energy densities
    (reference src/terms/xc.jl:45-53, CoreKineticEnergyDensity)."""
    return _atomic_superposition(basis, "has_core_tau", "core_tau_fourier")


def _energy_psp_correction(model):
    corr = 0.0
    for group in model.atom_groups:
        el = model.atoms[group[0]]
        if isinstance(el, ElementPsp):
            corr += len(group) * el.psp.energy_correction()
    return corr * model.n_electrons / model.unit_cell_volume
