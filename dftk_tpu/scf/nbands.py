"""Band-count strategies (DFTK `src/scf/nbands_algorithm.jl`).

FixedBands: explicit counts.  AdaptiveBands: converge enough bands that the
occupation of the topmost computed band is negligible; if not, grow the band
count between SCF iterations (shapes stay static within each jitted step -
growth triggers a recompile, which is rare).
"""
import dataclasses
import math
from typing import Optional

import numpy as np


@dataclasses.dataclass
class FixedBands:
    n_bands_converge: int
    n_bands_compute: Optional[int] = None

    def bands(self, model):
        nc = self.n_bands_converge
        return nc, (self.n_bands_compute or nc + max(3, nc // 10))

    def update(self, occupation, eigenvalues, occupation_threshold):
        return None   # never grows


@dataclasses.dataclass
class AdaptiveBands:
    """Default band count + growth when the top band is still occupied."""
    occupation_threshold: float = 1e-8
    gap_factor: float = 1.05
    n_bands_converge: Optional[int] = None

    def bands(self, model):
        n_occ = int(math.ceil(model.n_electrons / model.filled_occupation))
        if model.temperature == 0:
            nc = self.n_bands_converge or n_occ
        else:
            nc = self.n_bands_converge or max(n_occ + 3,
                                              int(math.ceil(1.05 * n_occ)))
        return nc, nc + max(3, nc // 10)

    def update(self, occupation, eigenvalues, occupation_threshold=None):
        """Return a larger (nc, ntot) if the top computed band is occupied."""
        thr = occupation_threshold or self.occupation_threshold
        occ = np.asarray(occupation)
        nb = occ.shape[1]
        # highest band with non-negligible occupation on any k-point
        occupied = np.nonzero(np.any(occ > thr, axis=0))[0]
        top = int(occupied[-1]) if len(occupied) else -1
        if top >= nb - 2:     # occupied bands reach into the safety margin
            nc = nb + max(2, nb // 5)
            return nc, nc + max(3, nc // 10)
        return None
