"""Linear combinations of pseudopotentials (virtual crystal approximation).

Counterpart of the reference's PspLinComb (DFTK `src/pseudo/PspLinComb.jl`):
an alloyed "virtual" species whose local potential / projectors / densities
are coefficient-weighted sums of the constituent pseudopotentials.  The
nonlocal part concatenates the radial projectors of every constituent per
angular-momentum channel and builds a block-diagonal coupling matrix
h[l] = blkdiag(c_i * h_i[l]) — exactly what the KB energy
sum_i c_i <psi|p_i> h_i <p_i|psi> requires.

Works with any psp implementing the NormConservingPsp protocol used in
`ops/terms.py` (PspHgh, PspUpf, or another PspLinComb).
"""
import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PspLinComb:
    coefficients: Tuple[float, ...]
    psps: Tuple[object, ...]
    identifier: str = ""
    description: str = "linear combination of pseudopotentials"

    def __post_init__(self):
        assert len(self.coefficients) == len(self.psps) and len(self.psps) > 0
        object.__setattr__(self, "coefficients",
                           tuple(float(c) for c in self.coefficients))
        object.__setattr__(self, "psps", tuple(self.psps))
        if not self.identifier:
            ident = "+".join(f"{c:g}*{getattr(p, 'identifier', '?')}"
                             for c, p in zip(self.coefficients, self.psps))
            object.__setattr__(self, "identifier", f"lincomb({ident})")

    # -- charge -------------------------------------------------------------
    @property
    def Zion(self):
        return sum(c * p.Zion for c, p in zip(self.coefficients, self.psps))

    # -- local part ----------------------------------------------------------
    def local_fourier(self, p):
        return sum(c * psp.local_fourier(p)
                   for c, psp in zip(self.coefficients, self.psps))

    def local_fourier_sq(self, psq):
        return sum(c * psp.local_fourier_sq(psq)
                   for c, psp in zip(self.coefficients, self.psps))

    def local_real(self, r):
        return sum(c * psp.local_real(r)
                   for c, psp in zip(self.coefficients, self.psps))

    def energy_correction(self):
        return sum(c * psp.energy_correction()
                   for c, psp in zip(self.coefficients, self.psps))

    # -- nonlocal part: concatenated radial projectors ------------------------
    @property
    def lmax(self):
        return max(p.lmax for p in self.psps)

    def n_proj_radial(self, l):
        return sum(p.n_proj_radial(l) if l <= p.lmax else 0 for p in self.psps)

    def n_proj(self):
        return sum((2 * l + 1) * self.n_proj_radial(l)
                   for l in range(self.lmax + 1))

    def _locate(self, i, l):
        """Map global radial index i (1-based) in channel l to (psp, local i)."""
        for psp in self.psps:
            n = psp.n_proj_radial(l) if l <= psp.lmax else 0
            if i <= n:
                return psp, i
            i -= n
        raise IndexError(f"projector index out of range (l={l})")

    def projector_fourier(self, i, l, p):
        psp, j = self._locate(i, l)
        return psp.projector_fourier(j, l, p)

    def projector_fourier_sq(self, i, l, psq):
        psp, j = self._locate(i, l)
        return psp.projector_fourier_sq(j, l, psq)

    @property
    def h(self):
        """Per-l block-diagonal coupling: blkdiag over psps of c_i * h_i[l]."""
        import numpy as np
        out = []
        for l in range(self.lmax + 1):
            n = self.n_proj_radial(l)
            H = np.zeros((n, n))
            off = 0
            for c, psp in zip(self.coefficients, self.psps):
                nl = psp.n_proj_radial(l) if l <= psp.lmax else 0
                if nl:
                    H[off:off + nl, off:off + nl] = c * np.asarray(psp.h[l])
                    off += nl
            out.append(H)
        return tuple(out)

    # -- densities ------------------------------------------------------------
    def has_valence_density(self):
        return all(getattr(p, "has_valence_density", lambda: False)()
                   for p in self.psps)

    def valence_density_fourier(self, p):
        return sum(c * psp.valence_density_fourier(p)
                   for c, psp in zip(self.coefficients, self.psps))

    def has_core_density(self):
        return any(getattr(p, "has_core_density", lambda: False)()
                   for p in self.psps)

    def core_density_fourier(self, p):
        tot = 0.0
        for c, psp in zip(self.coefficients, self.psps):
            if getattr(psp, "has_core_density", lambda: False)():
                tot = tot + c * psp.core_density_fourier(p)
        return tot

    def has_core_tau(self):
        return any(getattr(p, "has_core_tau", lambda: False)()
                   for p in self.psps)

    def core_tau_fourier(self, p):
        tot = 0.0
        for c, psp in zip(self.coefficients, self.psps):
            if getattr(psp, "has_core_tau", lambda: False)():
                tot = tot + c * psp.core_tau_fourier(p)
        return tot


def virtual_crystal_approximation(el1, el2, x, symbol=None):
    """ElementPsp for the alloy (1-x)*el1 + x*el2 (VCA).

    el1/el2: ElementPsp of the two end-member species; x in [0, 1].
    """
    from .elements import ElementPsp
    psp = PspLinComb((1.0 - x, x), (el1.psp, el2.psp))
    Z = (1.0 - x) * el1.Z + x * el2.Z
    return ElementPsp(symbol=symbol or f"{el1.symbol}{el2.symbol}",
                      Z=Z, psp=psp)
