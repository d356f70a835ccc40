"""Coulomb interaction kernels in Fourier space (reference src/coulomb.jl).

Kernels map |G|^2 -> v(G) (bohr^3 Ha); used by the exact-exchange term.
The G=0 singularity handling follows the reference's regularisation zoo:
  * Coulomb(ProbeCharge): 4 pi/G^2 with the G=0 element replaced by the
    probe-charge (Gygi-Baldereschi-style) average over the BZ cell
  * SphericallyTruncatedCoulomb: 4 pi (1 - cos(|G| Rc))/G^2 (finite at G=0)
  * ShortRangeCoulomb / LongRangeCoulomb: erfc/erf range separation (HSE)
"""
import dataclasses
import math

import numpy as np


@dataclasses.dataclass(frozen=True)
class Coulomb:
    """Bare 4 pi / G^2 with a probe-charge DC regularisation.

    v0 overrides the G=0 element (reference ReplaceSingularity); used e.g.
    to compare hybrids across G=0 conventions in tests.
    """
    v0: float = None

    def fourier(self, Gsq, volume):
        out = np.where(Gsq > 0, 4 * math.pi / np.where(Gsq > 0, Gsq, 1.0), 0.0)
        if self.v0 is not None:
            return np.where(Gsq > 0, out, self.v0)
        # probe-charge regularisation: the q->0 average of 4pi/q^2 over the
        # volume element each k/G point represents:
        #   v(0) ~ 4 pi * alpha, alpha = (3/(4 pi^2)) (6 pi^2 / Omega)^{-2/3}...
        # use the spherical-cell estimate with the same volume
        Rc = (3 * volume / (4 * math.pi)) ** (1 / 3)
        out = np.where(Gsq > 0, out, 2 * math.pi * Rc ** 2)
        return out


@dataclasses.dataclass(frozen=True)
class SphericallyTruncatedCoulomb:
    """Coulomb truncated beyond Rc (default: sphere of the cell volume)."""
    rc: float = None

    def fourier(self, Gsq, volume):
        rc = self.rc or (3 * volume / (4 * math.pi)) ** (1 / 3)
        G = np.sqrt(np.maximum(Gsq, 0.0))
        out = np.where(Gsq > 0,
                       4 * math.pi * (1 - np.cos(np.where(Gsq > 0, G, 1.0) * rc))
                       / np.where(Gsq > 0, Gsq, 1.0),
                       2 * math.pi * rc ** 2)
        return out


@dataclasses.dataclass(frozen=True)
class ShortRangeCoulomb:
    """erfc(mu r)/r: v(G) = 4 pi/G^2 (1 - e^{-G^2/(4 mu^2)}) (HSE screening)."""
    mu: float = 0.11   # HSE06 screening in bohr^-1

    def fourier(self, Gsq, volume):
        safe = np.where(Gsq > 0, Gsq, 1.0)
        out = np.where(Gsq > 0,
                       4 * math.pi / safe * (1 - np.exp(-safe / (4 * self.mu ** 2))),
                       math.pi / self.mu ** 2)   # exact G->0 limit
        return out


@dataclasses.dataclass(frozen=True)
class LongRangeCoulomb:
    """erf(mu r)/r: v(G) = 4 pi/G^2 e^{-G^2/(4 mu^2)} (zero DC convention)."""
    mu: float = 0.11

    def fourier(self, Gsq, volume):
        safe = np.where(Gsq > 0, Gsq, 1.0)
        return np.where(Gsq > 0,
                        4 * math.pi / safe * np.exp(-safe / (4 * self.mu ** 2)),
                        0.0)
