"""Numerical UPF (Unified Pseudopotential Format v2) pseudopotentials.

Counterpart of DFTK `src/pseudo/PspUpf.jl` + `common/hankel.jl` +
`common/quadrature.jl`: radial-grid quantities (local potential, r^2-scaled
Kleinman-Bylander projectors, pseudo-wavefunctions, valence/core densities)
are Hankel-transformed to Fourier space with Simpson quadrature; the local
potential's Coulomb tail is regularised QE-style by subtracting
-Z erf(r)/r (whose transform -4 pi Z/p^2 e^{-p^2/4} is analytic).

All evaluators are vectorised numpy over |p| arrays (setup-time host code);
`projector_fourier` divides out p^l (solid-harmonic convention shared with
PspHgh) so downstream form-factor assembly is identical for both families.

Supports norm-conserving UPF 2.0.x files (no SO / ultrasoft / PAW).
"""
import dataclasses
import math
import re
import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

import numpy as np
from scipy.special import erf, spherical_jn


def simpson_weights(r):
    """Quadrature weights w with  integral f ~= sum_i w_i f(r_i).

    Composite Simpson on (piecewise-)uniform or nonuniform grids, matching
    the reference's simpson()/simpson_nonuniform (quadrature.jl).
    """
    r = np.asarray(r, dtype=float)
    n = len(r)
    w = np.zeros(n)
    if n < 5:
        if n == 1:
            return w
        w[0] = (r[1] - r[0]) / 2
        w[-1] = (r[-1] - r[-2]) / 2
        for i in range(1, n - 1):
            w[i] = (r[i + 1] - r[i - 1]) / 2
        return w

    dx0 = r[1] - r[0]
    uniform = abs((r[2] - r[1]) - dx0) < 1e-10 * abs(dx0)
    if uniform:
        n_int = n - 1
        odd = n_int % 2 == 1
        jstop = n - 3 if odd else n - 2     # last regular interior point
        w[0] = dx0 / 3
        for j in range(1, jstop + 1):
            w[j] = (4 / 3 if j % 2 == 1 else 2 / 3) * dx0
        if odd:
            # last interval by the 3-point end-correction (quadrature.jl)
            w[n - 1] += 5 / 12 * dx0
            w[n - 2] += dx0
            w[n - 3] += -1 / 12 * dx0
        else:
            w[n - 1] = dx0 / 3
        return w

    # nonuniform composite Simpson over interval pairs
    n_int = n - 1
    i = 0
    while i + 2 <= n_int:
        h0 = r[i + 1] - r[i]
        h1 = r[i + 2] - r[i + 1]
        hsum = h0 + h1
        w[i] += hsum / 6 * (2 - h1 / h0)
        w[i + 1] += hsum ** 3 / (6 * h0 * h1)
        w[i + 2] += hsum / 6 * (2 - h0 / h1)
        i += 2
    if i < n_int:  # one leftover interval: corrected trapezoid
        h0 = r[-1] - r[-2]
        h1 = r[-2] - r[-3]
        w[-1] += h0 * (2 * h0 + 3 * h1) / (6 * (h0 + h1))
        w[-2] += h0 * (h0 + 3 * h1) / (6 * h1)
        w[-3] -= h0 ** 3 / (6 * h1 * (h0 + h1))
    return w


def _sph_jl_over_xl(l, x):
    """j_l(x) / x^l, stable at x = 0 (numpy-vectorised)."""
    x = np.asarray(x, dtype=float)
    small = np.abs(x) < 1e-3
    xs = np.where(small, 1.0, x)
    dfact = [1.0, 3.0, 15.0, 105.0, 945.0][l]
    # series: j_l(x)/x^l = 1/(2l+1)!! (1 - x^2/(2(2l+3)) + x^4/(8(2l+3)(2l+5)))
    x2 = x * x
    series = (1 - x2 / (2 * (2 * l + 3))
              + x2 * x2 / (8 * (2 * l + 3) * (2 * l + 5))) / dfact
    exact = spherical_jn(l, xs) / xs ** l
    return np.where(small, series, exact)


def _unique_eval(fn, p):
    """Evaluate fn on the unique values of p (any shape) and scatter back."""
    p = np.asarray(p, dtype=float)
    flat = p.reshape(-1)
    uniq, inv = np.unique(np.round(flat, 12), return_inverse=True)
    return fn(uniq)[inv].reshape(p.shape)


def _is_np(x):
    """True for numpy/scalar inputs (static path); False for jax values."""
    return isinstance(x, (np.ndarray, float, int, np.floating, np.integer))


def _hankel_traced(r, r2_f, l, psq, weights):
    """Hankel transform 4 pi / p^l int f(r) j_l(pr) r^2 dr as a traceable
    jnp expression of psq = p^2 (used when |G| carries lattice AD).

    j_l(x)/x^l is evaluated with a small-x series switch (l <= 3 covers all
    norm-conserving psps here); radial chunking bounds the [n_p, n_r]
    intermediate.
    """
    import jax.numpy as jnp

    def jl_over_xl(l, x):
        xs = jnp.maximum(x, 1e-8)
        x2 = x * x
        if l == 0:
            return jnp.where(x > 1e-4, jnp.sin(xs) / xs, 1.0 - x2 / 6)
        if l == 1:
            return jnp.where(x > 1e-3,
                             (jnp.sin(xs) - xs * jnp.cos(xs)) / xs ** 3,
                             1 / 3 - x2 / 30)
        if l == 2:
            return jnp.where(x > 1e-2,
                             ((3 - xs ** 2) * jnp.sin(xs)
                              - 3 * xs * jnp.cos(xs)) / xs ** 5,
                             1 / 15 - x2 / 210)
        if l == 3:
            return jnp.where(x > 1e-2,
                             ((15 - 6 * xs ** 2) * jnp.sin(xs)
                              - (15 * xs - xs ** 3) * jnp.cos(xs)) / xs ** 7,
                             1 / 105 - x2 / 1890)
        raise NotImplementedError(f"l={l}")

    r_np = np.asarray(r, dtype=float)
    wf_np = np.asarray(weights, dtype=float) * np.asarray(r2_f, dtype=float)
    psq = jnp.asarray(psq)
    # floor inside sqrt: d sqrt/d psq -> inf at 0 would NaN the where-masked
    # gradient; the clamp zeroes it instead (j_l is smooth there anyway)
    p = jnp.sqrt(jnp.maximum(psq, 1e-30)).reshape(-1)
    out = jnp.zeros(p.shape, dtype=p.dtype)
    for i in range(0, len(r_np), 256):
        rc = jnp.asarray(r_np[i:i + 256])
        wf = jnp.asarray(wf_np[i:i + 256])
        x = p[:, None] * rc[None, :]
        out = out + 4 * math.pi * jnp.sum(
            wf[None, :] * jl_over_xl(l, x) * rc[None, :] ** l, axis=1)
    return out.reshape(psq.shape)


def hankel(r, r2_f, l, p, weights=None):
    """Modified Hankel transform 4 pi / p^l  int f(r) j_l(pr) r^2 dr.

    Vectorised over p of any shape (deduplicated + chunked).
    """
    r = np.asarray(r, dtype=float)
    r2_f = np.asarray(r2_f, dtype=float)
    if weights is None:
        weights = simpson_weights(r)
    wf = weights * r2_f

    def eval_flat(pf):
        out = np.empty(pf.shape)
        chunk = max(1, int(4e6 // max(len(r), 1)))
        for i in range(0, len(pf), chunk):
            pc = pf[i:i + chunk, None]
            # j_l(pr)/(pr)^l * r^l  -> divides out p^l as required
            out[i:i + chunk] = 4 * math.pi * np.sum(
                wf[None, :] * _sph_jl_over_xl(l, pc * r[None, :])
                * r[None, :] ** l, axis=1)
        return out

    return _unique_eval(eval_flat, p)


@dataclasses.dataclass(frozen=True, eq=False)
class PspUpf:
    Zion: int
    lmax: int
    rgrid: tuple
    vloc: tuple                     # local potential on rgrid (Ha)
    r2_projs: tuple                 # [l][i] -> r^2 beta on (truncated) grid
    h: tuple                        # coupling blocks per l (Ha)
    r2_pswfcs: tuple                # [l][i] -> r^2 chi
    pswfc_occs: tuple
    pswfc_labels: tuple
    r2_rho_ion: tuple
    r2_rho_core: tuple
    r2_tau_core: tuple = ()         # NLCC core kinetic-energy density (mGGA)
    identifier: str = ""
    description: str = ""

    def __hash__(self):
        return hash(self.identifier)

    def __eq__(self, other):
        return self is other or (isinstance(other, PspUpf)
                                 and self.identifier == other.identifier)

    # cached numpy views -----------------------------------------------------
    @property
    def _r(self):
        return np.asarray(self.rgrid)

    @property
    def _w(self):
        if not hasattr(self, "_w_cache"):
            object.__setattr__(self, "_w_cache", simpson_weights(self._r))
        return self._w_cache

    def n_proj_radial(self, l):
        return len(self.r2_projs[l]) if l <= self.lmax else 0

    def n_proj(self):
        return sum((2 * l + 1) * self.n_proj_radial(l)
                   for l in range(self.lmax + 1))

    def n_pswfc_radial(self, l):
        return len(self.r2_pswfcs[l]) if l < len(self.r2_pswfcs) else 0

    def n_pswfc(self):
        return sum((2 * l + 1) * self.n_pswfc_radial(l)
                   for l in range(len(self.r2_pswfcs)))

    # evaluators --------------------------------------------------------------
    def local_fourier(self, p):
        """QE-style tail-corrected Hankel transform of the local potential."""
        r = self._r
        w = self._w
        f = r * np.asarray(self.vloc) + self.Zion * erf(r)
        wf = w * f

        def eval_flat(pf):
            ps = np.where(pf == 0, 1.0, pf)
            out = np.empty(pf.shape)
            chunk = max(1, int(4e6 // max(len(r), 1)))
            for i in range(0, len(pf), chunk):
                pc = ps[i:i + chunk, None]
                I = np.sum(wf[None, :] * np.sin(pc * r[None, :]), axis=1) \
                    / ps[i:i + chunk]
                out[i:i + chunk] = 4 * math.pi * (
                    I - self.Zion / ps[i:i + chunk] ** 2
                    * np.exp(-ps[i:i + chunk] ** 2 / 4))
            return np.where(pf == 0, 0.0, out)

        return _unique_eval(eval_flat, p)

    def local_fourier_sq(self, psq):
        if _is_np(psq):
            return self.local_fourier(np.sqrt(np.maximum(psq, 0.0)))
        # traced path (lattice AD in stresses): same QE tail-corrected
        # transform as local_fourier, expressed in jnp
        import jax.numpy as jnp
        r_np = np.asarray(self._r, dtype=float)
        wf_np = np.asarray(self._w, dtype=float) \
            * (r_np * np.asarray(self.vloc, dtype=float)
               + self.Zion * erf(r_np))
        psq = jnp.asarray(psq)
        p = jnp.sqrt(jnp.maximum(psq, 1e-30))
        I = jnp.zeros(p.reshape(-1).shape, dtype=p.dtype)
        pf = p.reshape(-1)
        for i in range(0, len(r_np), 256):
            r = jnp.asarray(r_np[i:i + 256])
            wf = jnp.asarray(wf_np[i:i + 256])
            I = I + jnp.sum(wf[None, :] * jnp.sin(pf[:, None] * r[None, :]),
                            axis=1)
        V = 4 * math.pi * (I / pf - self.Zion / pf ** 2
                           * jnp.exp(-pf ** 2 / 4))
        return jnp.where(psq.reshape(-1) > 1e-20, V, 0.0).reshape(psq.shape)

    def local_real(self, r):
        return np.interp(r, self._r, np.asarray(self.vloc))

    def projector_fourier(self, i, l, p):
        r2b = np.asarray(self.r2_projs[l][i - 1])
        n = len(r2b)
        return hankel(self._r[:n], r2b, l, p, weights=simpson_weights(self._r[:n]))

    def projector_fourier_sq(self, i, l, psq):
        if _is_np(psq):
            return self.projector_fourier(i, l, np.sqrt(np.maximum(psq, 0.0)))
        r2b = np.asarray(self.r2_projs[l][i - 1])
        n = len(r2b)
        return _hankel_traced(self._r[:n], r2b, l, psq,
                              simpson_weights(self._r[:n]))

    def pswfc_fourier(self, i, l, p):
        return hankel(self._r, np.asarray(self.r2_pswfcs[l][i - 1]), l, p,
                      weights=self._w)

    def valence_density_fourier(self, p):
        return hankel(self._r, np.asarray(self.r2_rho_ion), 0, p,
                      weights=self._w)

    def core_density_fourier(self, p):
        return hankel(self._r, np.asarray(self.r2_rho_core), 0, p,
                      weights=self._w)

    def core_density_fourier_sq(self, psq):
        """l=0 Hankel of the core density from p^2; traceable for jax
        inputs (used when |G| carries lattice AD, see stresses.py)."""
        if _is_np(psq):
            return self.core_density_fourier(np.sqrt(np.maximum(psq, 0.0)))
        return _hankel_traced(self._r, np.asarray(self.r2_rho_core), 0,
                              psq, self._w)

    def core_tau_fourier(self, p):
        """l=0 Hankel transform of the core kinetic-energy density tau_core
        (reference eval_psp_core_kinetic_energy_density_fourier,
        src/pseudo/PspUpf.jl:302-306); needed for mGGA + NLCC psps."""
        return hankel(self._r, np.asarray(self.r2_tau_core), 0, p,
                      weights=self._w)

    def core_tau_fourier_sq(self, psq):
        """core_tau_fourier from p^2; traceable for jax inputs (lattice AD)."""
        if _is_np(psq):
            return self.core_tau_fourier(np.sqrt(np.maximum(psq, 0.0)))
        return _hankel_traced(self._r, np.asarray(self.r2_tau_core), 0,
                              psq, self._w)

    def has_valence_density(self):
        return any(v != 0 for v in self.r2_rho_ion)

    def has_core_density(self):
        return any(v != 0 for v in self.r2_rho_core)

    def has_core_tau(self):
        """True if the psp carries a core kinetic-energy density (reference
        has_core_kinetic_energy_density, src/pseudo/PspUpf.jl:180)."""
        return any(v != 0 for v in self.r2_tau_core)

    def energy_correction(self):
        r = self._r
        return float(4 * math.pi * np.sum(
            self._w * r * (r * np.asarray(self.vloc) + self.Zion)))


def _floats(text):
    return np.array([float(x) for x in text.split()], dtype=float)


def parse_upf(path_or_text, identifier=None) -> PspUpf:
    """Parse a UPF v2 XML file (path or raw text)."""
    if "\n" in str(path_or_text) or "<UPF" in str(path_or_text):
        text = path_or_text
        identifier = identifier or "upf"
    else:
        with open(path_or_text) as f:
            text = f.read()
        identifier = identifier or str(path_or_text)
    # some files contain bare '&' characters which break XML parsing
    text = re.sub(r"&(?![a-zA-Z]+;)", "&amp;", text)
    root = ET.fromstring(text)
    if root.tag != "UPF":
        raise ValueError("Not a UPF v2 file")

    header = root.find("PP_HEADER").attrib
    if header.get("pseudo_type", "NC") not in ("NC", "SL"):
        raise NotImplementedError(
            f"Unsupported pseudo type {header.get('pseudo_type')}")
    if header.get("has_so", "F").upper().startswith("T"):
        raise NotImplementedError("Spin-orbit UPF not supported")

    Zion = int(float(header["z_valence"]))
    lmax = int(header["l_max"])

    mesh = root.find("PP_MESH")
    r = _floats(mesh.find("PP_R").text)
    vloc = _floats(root.find("PP_LOCAL").text) / 2           # Ry -> Ha

    nonlocal_ = root.find("PP_NONLOCAL")
    betas = []
    for el in nonlocal_:
        if el.tag.startswith("PP_BETA"):
            l = int(el.attrib["angular_momentum"])
            icut = int(el.attrib.get("cutoff_radius_index",
                                     len(_floats(el.text))))
            rb = _floats(el.text)[:icut] / 2                  # Ry -> Ha
            betas.append((l, r[:len(rb)] * rb))               # r beta -> r^2 beta
    dij = _floats(nonlocal_.find("PP_DIJ").text) * 2          # 1/Ry -> 1/Ha
    nb = len(betas)
    dij = dij.reshape(nb, nb)

    r2_projs = []
    h = []
    for l in range(lmax + 1):
        idx = [i for i, (bl, _) in enumerate(betas) if bl == l]
        r2_projs.append(tuple(tuple(betas[i][1]) for i in idx))
        h.append(tuple(map(tuple, dij[np.ix_(idx, idx)])))

    r2_pswfcs: List[tuple] = [[] for _ in range(lmax + 1)]
    occs: List[tuple] = [[] for _ in range(lmax + 1)]
    labels: List[tuple] = [[] for _ in range(lmax + 1)]
    pswfc = root.find("PP_PSWFC")
    if pswfc is not None:
        for el in pswfc:
            if el.tag.startswith("PP_CHI"):
                l = int(el.attrib["l"])
                if l > lmax:
                    while len(r2_pswfcs) <= l:
                        r2_pswfcs.append([])
                        occs.append([])
                        labels.append([])
                chi = _floats(el.text)
                r2_pswfcs[l].append(tuple(r[:len(chi)] * chi))  # r chi -> r^2 chi
                occs[l].append(float(el.attrib.get("occupation", 0)))
                labels[l].append(el.attrib.get("label", ""))

    rhoatom = root.find("PP_RHOATOM")
    r2_rho_ion = (_floats(rhoatom.text) / (4 * math.pi) if rhoatom is not None
                  else np.zeros(len(r)))
    nlcc = root.find("PP_NLCC")
    r2_rho_core = (r ** 2 * _floats(nlcc.text) if nlcc is not None
                   else np.zeros(len(r)))
    # Core kinetic-energy density for mGGA-consistent NLCC psps (QE "m"
    # pseudos); same r^2 scaling as the reference (src/pseudo/PspUpf.jl:158).
    taumod = root.find("PP_TAUMOD")
    r2_tau_core = (r ** 2 * _floats(taumod.text) if taumod is not None
                   else np.zeros(len(r)))

    return PspUpf(
        Zion=Zion, lmax=lmax, rgrid=tuple(r), vloc=tuple(vloc),
        r2_projs=tuple(r2_projs), h=tuple(h),
        r2_pswfcs=tuple(tuple(x) for x in r2_pswfcs),
        pswfc_occs=tuple(tuple(x) for x in occs),
        pswfc_labels=tuple(tuple(x) for x in labels),
        r2_rho_ion=tuple(r2_rho_ion), r2_rho_core=tuple(r2_rho_core),
        r2_tau_core=tuple(r2_tau_core),
        identifier=identifier,
        description=header.get("comment", ""))


def load_psp_upf(path) -> PspUpf:
    return parse_upf(path)
