"""The Model: physics specification of a periodic Kohn-Sham problem.

Holds everything *before* discretization (DFTK `src/Model.jl:6-219`): lattice,
atoms + positions, electron count, spin mode, temperature + smearing, the list
of energy-term builders, and the crystal symmetries.  Purely host-side
(numpy); the PlaneWaveBasis turns it into device arrays.
"""
import dataclasses
import math
from typing import Any, List, Optional, Sequence

import numpy as np

from ..utils import lattice as lat
from ..symmetry import SymOp, symmetry_operations
from .smearing import FermiDirac, NoSmearing, SmearingFunction


@dataclasses.dataclass
class Model:
    lattice: np.ndarray                  # 3x3, columns = lattice vectors (bohr)
    atoms: List[Any]                     # Element objects (may be empty)
    positions: List[np.ndarray]          # fractional coordinates
    n_electrons: Optional[int] = None
    temperature: float = 0.0
    smearing: Optional[SmearingFunction] = None
    spin_polarization: str = "none"      # none | collinear | spinless
    term_types: Sequence[Any] = ()
    symmetries: Any = True               # True/False or explicit list of SymOp
    magnetic_moments: Sequence[Any] = ()
    extra_charge: float = 0.0

    # derived (filled in __post_init__)
    recip_lattice: np.ndarray = None
    inv_lattice: np.ndarray = None
    unit_cell_volume: float = None
    atom_groups: List[List[int]] = None

    def __post_init__(self):
        self.lattice = np.asarray(self.lattice, dtype=float)
        assert self.lattice.shape == (3, 3)
        self.positions = [np.asarray(p, dtype=float) for p in self.positions]
        assert len(self.atoms) == len(self.positions)

        self.n_dim = lat.lattice_n_dim(self.lattice)
        self.inv_lattice = lat.block_inverse(self.lattice)
        self.recip_lattice = lat.compute_recip_lattice(self.lattice)
        self.unit_cell_volume = float(lat.compute_unit_cell_volume(self.lattice))

        if self.n_electrons is None:
            self.n_electrons = int(sum(at.charge_ionic() for at in self.atoms)
                                   - self.extra_charge)

        if self.smearing is None:
            self.smearing = NoSmearing() if self.temperature == 0 else FermiDirac()

        if self.spin_polarization not in ("none", "collinear", "spinless"):
            raise ValueError(f"spin_polarization {self.spin_polarization}")
        if len(self.magnetic_moments) > 0 and self.spin_polarization == "none":
            self.spin_polarization = "collinear"

        # atom groups: indices of identical elements
        groups = {}
        for i, at in enumerate(self.atoms):
            groups.setdefault(at, []).append(i)
        self.atom_groups = list(groups.values())

        # symmetries
        if self.symmetries is True:
            if len(self.atoms) == 0:
                self.symmetries = [SymOp.identity()]
            else:
                magmoms = self.magnetic_moments if len(self.magnetic_moments) else None
                self.symmetries = symmetry_operations(
                    self.lattice, self.atoms, self.positions, magnetic_moments=magmoms)
        elif self.symmetries is False:
            self.symmetries = [SymOp.identity()]

    # -- spin ---------------------------------------------------------------
    @property
    def n_spin_components(self):
        return 2 if self.spin_polarization == "collinear" else 1

    @property
    def filled_occupation(self):
        """Maximal occupation of one band (2 except for collinear/spinless)."""
        if self.spin_polarization in ("collinear", "spinless"):
            return 1
        return 2

    # -- coordinate transforms (vectors / covectors, DFTK Model.jl:395-437) --
    def vector_red_to_cart(self, r):
        return self.lattice @ r

    def vector_cart_to_red(self, r):
        return self.inv_lattice @ r

    def covector_red_to_cart(self, f):
        return self.inv_lattice.T @ f

    def covector_cart_to_red(self, f):
        return self.lattice.T @ f

    def recip_vector_red_to_cart(self, G):
        return self.recip_lattice @ G

    def __repr__(self):
        syms = [getattr(a, "symbol", type(a).__name__) for a in self.atoms]
        xc = [t for t in self.term_types
              if type(t).__name__ == "Xc"]
        fun = list(xc[0].functionals) if xc else []
        return (f"Model({'+'.join(syms) or 'empty'}, n_electrons="
                f"{self.n_electrons}, spin={self.spin_polarization}, "
                f"T={self.temperature}, functionals={fun}, "
                f"n_symmetries={len(self.symmetries)})")

    def default_n_bands(self):
        """Default number of bands: enough to hold all electrons + buffer."""
        n_occ = int(math.ceil(self.n_electrons / self.filled_occupation))
        if self.temperature == 0:
            return n_occ
        return max(n_occ + 3, int(math.ceil(1.05 * n_occ)))
