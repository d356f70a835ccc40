"""Analytic GTH/HGH norm-conserving pseudopotentials.

Separable dual-space Gaussian pseudopotentials of Goedecker-Teter-Hutter
(GTH96) and Hartwigsen-Goedecker-Hutter (HGH98).  Everything has closed-form
expressions in both real and Fourier space, which makes this family ideal for
a first TPU-native implementation: form factors are elementwise jnp
expressions over |k+G| arrays, no radial grids or interpolation.

Parity reference: DFTK `src/pseudo/PspHgh.jl` (parser: lines 25-94, local
potential Fourier: 110-124, projectors: 140-164, energy correction: 173-184).
The code here is an independent implementation of the published formulas
(GTH96 eq. (1)-(8), HGH98 eq. (1)-(15) with the known GTH-paper correction to
the (l=0, i=2) projector normalisation).

Conventions:
  * `local_fourier(p)` is the Fourier transform of the local potential minus
    the -Z/r Coulomb tail's G=0 divergence; at p=0 it returns 0 (the
    compensating-background convention).  Units: Hartree * bohr^3.
  * `projector_fourier(i, l, p)` is the radial part of \\hat{proj}_{il}(p)
    with the 1/p^l factor divided out (combined later with real solid
    harmonics, see ops/nonlocal form factors).
"""
import dataclasses
import math
import re
from typing import List

import numpy as np

from .psp_data import HGH_PSP_TABLE


@dataclasses.dataclass(frozen=True)
class PspHgh:
    Zion: int                 # ionic charge (Z - n_core_electrons)
    rloc: float               # range of the local Gaussian charge
    cloc: tuple               # 4 coefficients of the local polynomial part
    rp: tuple                 # projector radius per angular-momentum channel
    h: tuple                  # per-l coupling matrices (tuple of 2D tuples)
    identifier: str = ""
    description: str = ""

    @property
    def lmax(self):
        return len(self.rp) - 1

    def n_proj_radial(self, l):
        """Number of radial projectors i for angular momentum l."""
        if l > self.lmax:
            return 0
        return len(self.h[l])

    def n_proj(self):
        """Total number of projectors Sum_l (2l+1) * nproj_l."""
        return sum((2 * l + 1) * self.n_proj_radial(l) for l in range(self.lmax + 1))

    # -- local potential ----------------------------------------------------
    def local_fourier(self, p):
        """V_loc(|p|) in Fourier space (GTH96 eq. (6); 1/sqrt(Omega)-free).

        Vectorised over p (numpy or jnp array).  p=0 -> 0.
        """
        return self.local_fourier_sq(p * p)

    def local_fourier_sq(self, psq):
        """Same as local_fourier but as a function of p^2.

        The HGH forms are even in p; taking p^2 keeps the expression smooth
        under autodiff at p=0 (no sqrt in the graph - needed for stresses).
        """
        xp = _xp(psq)
        t2 = psq * self.rloc ** 2
        c1, c2, c3, c4 = self.cloc
        P = (c1
             + c2 * (3 - t2)
             + c3 * (15 - 10 * t2 + t2 * t2)
             + c4 * (105 - 105 * t2 + 21 * t2 * t2 - t2 * t2 * t2))
        pref = 4 * math.pi * self.rloc ** 2
        # safe division by t^2 at p=0 (result overwritten by where)
        t2s = xp.where(t2 == 0, 1.0, t2)
        val = pref * (-self.Zion + math.sqrt(math.pi / 2) * self.rloc * t2 * P) \
            * xp.exp(-t2 / 2) / t2s
        return xp.where(t2 == 0, 0.0, val)

    def local_real(self, r):
        """V_loc(r) in real space (GTH96 eq. (1))."""
        xp = _xp(r)
        from scipy.special import erf as _erf  # host-side only
        erf = _erf if xp is np else __import__("jax.scipy.special", fromlist=["erf"]).erf
        rr = r / self.rloc
        c1, c2, c3, c4 = self.cloc
        rs = xp.where(r == 0, 1e-300, r)
        return (-self.Zion / rs * erf(rr / math.sqrt(2.0))
                + xp.exp(-rr ** 2 / 2) * (c1 + c2 * rr ** 2 + c3 * rr ** 4 + c4 * rr ** 6))

    # -- projectors ----------------------------------------------------------
    def projector_fourier(self, i, l, p):
        """Radial Fourier projector \\hat{proj}_{il}(p) / p^l (HGH98 eq. 7-15).

        i is 1-based (as in the published tables).  Vectorised over p.
        """
        return self.projector_fourier_sq(i, l, p * p)

    def projector_fourier_sq(self, i, l, psq):
        """projector_fourier as a function of p^2 (autodiff-smooth at p=0)."""
        xp = _xp(psq)
        rp = self.rp[l]
        t2 = psq * rp * rp
        common = (4 * math.pi ** (5 / 4) * math.sqrt(2.0 ** (l + 1) * rp ** 3)
                  * xp.exp(-t2 / 2))
        if l == 0:
            if i == 1:
                return common
            if i == 2:
                return common * 2 / math.sqrt(15.0) * (3 - t2)
            if i == 3:
                return common * 4 / (3 * math.sqrt(105.0)) * (15 - 10 * t2 + t2 * t2)
        if l == 1:
            if i == 1:
                return common / math.sqrt(3.0) * rp
            if i == 2:
                return common * 2 / math.sqrt(105.0) * rp * (5 - t2)
            if i == 3:
                return common * 4 / (3 * math.sqrt(1155.0)) * rp * (35 - 14 * t2 + t2 * t2)
        if l == 2:
            if i == 1:
                return common / math.sqrt(15.0) * rp ** 2
            if i == 2:
                return common * 2 / (3 * math.sqrt(105.0)) * rp ** 2 * (7 - t2)
        if l == 3 and i == 1:
            return common / math.sqrt(105.0) * rp ** 3
        raise NotImplementedError(f"HGH projector not implemented for l={l}, i={i}")

    def projector_real(self, i, l, r):
        """Real-space radial projector (HGH98 eq. (3))."""
        xp = _xp(r)
        rp = self.rp[l]
        ired = (4 * i - 1) / 2.0
        return (math.sqrt(2.0) * r ** (l + 2 * (i - 1)) * xp.exp(-r ** 2 / (2 * rp ** 2))
                / rp ** (l + ired) / math.sqrt(math.gamma(l + ired)))

    # -- energy correction ----------------------------------------------------
    def energy_correction(self):
        """DC-offset correction: lim_{p->0} (V_loc(p) + 4 pi Z / p^2).

        Per unit cell the term contributes  n_electrons * this / Omega
        (cf. DFTK PspHgh.jl:173-184).
        """
        coeffs = (1.0, 3.0, 15.0, 105.0)
        dc = (self.Zion * self.rloc ** 2 / 2
              + math.sqrt(math.pi / 2) * self.rloc ** 3
              * sum(c * cl for c, cl in zip(coeffs, self.cloc)))
        return 4 * math.pi * dc


def _xp(arr):
    if isinstance(arr, (np.ndarray, float, int)):
        return np
    import jax.numpy as jnp
    return jnp


_NUMS = re.compile(r"[-+]?[0-9]*\.?[0-9]+(?:[eEdD][-+]?[0-9]+)?")


def parse_hgh(text: str, identifier: str = "") -> PspHgh:
    """Parse the CP2K/ABINIT .hgh text format.

    Layout: line 1 description; line 2 electrons per occupied AM shell;
    line 3 rloc, nloc, cloc...; line 4 number of AM channels (lmax+1);
    then per channel a block: rp nproj followed by the upper triangle of
    the nproj x nproj coupling matrix h (continued on indented lines).
    """
    lines = [ln for ln in text.splitlines()]
    description = lines[0].strip()

    nums = lambda s: [float(x.replace("D", "e").replace("d", "e"))
                      for x in _NUMS.findall(s)]

    n_elec = [int(v) for v in nums(lines[1])]
    Zion = int(sum(n_elec))

    loc = nums(lines[2])
    rloc = loc[0]
    nloc = int(loc[1])
    cloc = loc[2:2 + nloc]
    cloc = tuple(cloc + [0.0] * (4 - len(cloc)))

    lmax = int(nums(lines[3])[0]) - 1

    rp: List[float] = []
    h: List[tuple] = []
    cur = 4
    for l in range(lmax + 1):
        head = nums(lines[cur])
        rp.append(head[0])
        nproj = int(head[1])
        if nproj == 0:
            h.append(tuple())
            cur += 1
            continue
        hmat = np.zeros((nproj, nproj))
        row_vals = head[2:]
        for i in range(nproj):
            for j in range(i, nproj):
                hmat[i, j] = hmat[j, i] = row_vals[j - i]
            cur += 1
            if cur < len(lines) and i + 1 < nproj:
                row_vals = nums(lines[cur])
        if nproj == 1:
            pass  # cur already advanced once in the loop
        else:
            pass
        h.append(tuple(tuple(row) for row in hmat))
    return PspHgh(Zion=Zion, rloc=rloc, cloc=cloc, rp=tuple(rp), h=tuple(h),
                  identifier=identifier, description=description)


def load_psp_hgh(key: str) -> PspHgh:
    """Load a built-in HGH psp by key, e.g. "lda/si-q4" or "Si" (semicore)."""
    from .psp_data import DEFAULT_Q_SEMICORE
    if key in HGH_PSP_TABLE:
        return parse_hgh(HGH_PSP_TABLE[key], identifier=f"hgh/{key}")
    # bare element symbol -> default LDA semicore
    sym = key.capitalize() if len(key) <= 2 else key
    if sym in DEFAULT_Q_SEMICORE:
        k = f"lda/{sym.lower()}-q{DEFAULT_Q_SEMICORE[sym]}"
        return parse_hgh(HGH_PSP_TABLE[k], identifier=f"hgh/{k}")
    raise KeyError(f"Unknown built-in HGH pseudopotential: {key}")


def load_psp(identifier: str):
    """Generic loader (the reference's load_psp, src/pseudo/load_psp.jl).

    Accepts "hgh/lda/si-q4" / "lda/si-q4" / bare "Si" for built-in GTH/HGH
    tables, or a path to a .upf/.UPF file.
    """
    s = str(identifier)
    if s.endswith(".upf") or s.endswith(".UPF"):
        from .psp_upf import load_psp_upf
        return load_psp_upf(s)
    if s.startswith("hgh/"):
        s = s[4:]
    return load_psp_hgh(s)


def list_psp(element=None, family=None):
    """Identifiers of all built-in pseudopotentials, optionally filtered.

    family: "lda" or "pbe" (the two built-in GTH tables).
    element: symbol, e.g. "Si".
    """
    from .psp_data import HGH_PSP_TABLE
    out = []
    for key in sorted(HGH_PSP_TABLE):
        fam, name = key.split("/", 1)
        sym = name.split("-")[0]
        if family is not None and fam != family.lower():
            continue
        if element is not None and sym != element.lower():
            continue
        out.append(f"hgh/{key}")
    return out
