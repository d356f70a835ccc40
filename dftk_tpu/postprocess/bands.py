"""Band structure computation along k-paths.

Mirrors DFTK `src/postprocess/band_structure.jl:14-70`: build a new basis
with explicit k-points, keep the SCF density fixed, and diagonalize the
Hamiltonian at every k.  High-symmetry paths for the common Bravais lattices
follow the Setyawan-Curtarolo conventions (the reference delegates this to
Brillouin.jl).
"""
import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..basis import PlaneWaveBasis
from ..bzmesh import ExplicitKpoints
from ..ops import hamiltonian as hamops
from ..ops.eigen.lobpcg import lobpcg
from ..scf.driver import random_orbitals


# high-symmetry points in reduced coordinates (Setyawan-Curtarolo)
_KPOINTS = {
    "cubic": {"G": [0, 0, 0], "X": [0, 1 / 2, 0], "M": [1 / 2, 1 / 2, 0],
              "R": [1 / 2, 1 / 2, 1 / 2]},
    "fcc": {"G": [0, 0, 0], "X": [1 / 2, 0, 1 / 2], "L": [1 / 2, 1 / 2, 1 / 2],
            "W": [1 / 2, 1 / 4, 3 / 4], "U": [5 / 8, 1 / 4, 5 / 8],
            "K": [3 / 8, 3 / 8, 3 / 4]},
    "bcc": {"G": [0, 0, 0], "H": [1 / 2, -1 / 2, 1 / 2], "N": [0, 0, 1 / 2],
            "P": [1 / 4, 1 / 4, 1 / 4]},
    "hexagonal": {"G": [0, 0, 0], "M": [1 / 2, 0, 0], "K": [1 / 3, 1 / 3, 0],
                  "A": [0, 0, 1 / 2], "L": [1 / 2, 0, 1 / 2],
                  "H": [1 / 3, 1 / 3, 1 / 2]},
}
_DEFAULT_PATHS = {
    "cubic": ["G", "X", "M", "G", "R", "X"],
    "fcc": ["G", "X", "W", "K", "G", "L", "U", "W"],
    "bcc": ["G", "H", "N", "G", "P", "H"],
    "hexagonal": ["G", "M", "K", "G", "A", "L", "H", "A"],
}


def detect_bravais(lattice, tol=1e-5):
    """Very small Bravais classifier for the common cases."""
    L = np.asarray(lattice, dtype=float)
    lengths = np.linalg.norm(L, axis=0)
    a = lengths[0]
    M = L.T @ L
    cos = np.array([M[1, 2], M[0, 2], M[0, 1]]) / np.array(
        [lengths[1] * lengths[2], lengths[0] * lengths[2],
         lengths[0] * lengths[1]])
    if np.allclose(lengths, a, atol=tol * a):
        if np.allclose(cos, 0, atol=tol):
            return "cubic"
        if np.allclose(cos, 0.5, atol=tol):
            return "fcc"
        if np.allclose(cos, -1 / 3, atol=tol):
            return "bcc"
    if (abs(lengths[0] - lengths[1]) < tol * a and abs(cos[2] + 0.5) < tol
            and np.allclose(cos[:2], 0, atol=tol)):
        return "hexagonal"
    return None


@dataclasses.dataclass
class KPath:
    kcoords: np.ndarray          # [n, 3]
    labels: Dict[int, str]       # index -> label
    kdistances: np.ndarray       # cumulative Cartesian path length


def irrfbz_path(lattice, kline_density=20, paths: Optional[Sequence[str]] = None):
    """Standard high-symmetry path for the detected Bravais class."""
    brav = detect_bravais(lattice)
    if brav is None:
        raise ValueError(
            "Could not classify the Bravais lattice; pass explicit kcoords")
    pts = _KPOINTS[brav]
    names = list(paths) if paths is not None else _DEFAULT_PATHS[brav]
    from ..utils.lattice import compute_recip_lattice
    B = compute_recip_lattice(np.asarray(lattice, dtype=float))

    kcoords: List[np.ndarray] = []
    labels: Dict[int, str] = {}
    dists = [0.0]
    for i in range(len(names) - 1):
        k0 = np.array(pts[names[i]], dtype=float)
        k1 = np.array(pts[names[i + 1]], dtype=float)
        seg_cart = np.linalg.norm(B @ (k1 - k0))
        n = max(2, int(np.ceil(seg_cart * kline_density)))
        ts = np.linspace(0, 1, n, endpoint=False) if i < len(names) - 2 \
            else np.linspace(0, 1, n + 1)
        if kcoords:
            labels[len(kcoords)] = names[i]
        else:
            labels[0] = names[0]
        for t in ts:
            k = k0 + t * (k1 - k0)
            if kcoords:
                dists.append(dists[-1]
                             + np.linalg.norm(B @ (k - kcoords[-1])))
            kcoords.append(k)
    labels[len(kcoords) - 1] = names[-1]
    return KPath(kcoords=np.array(kcoords), labels=labels,
                 kdistances=np.array(dists))


def compute_bands(scfres, kcoords=None, n_bands=None, kline_density=20,
                  tol=1e-8, maxiter=200):
    """Eigenvalues along a k-path at the fixed SCF density.

    Returns dict with eigenvalues [nk_path, n_bands], kpath info, epsF.
    """
    basis = scfres.basis
    model = basis.model
    kpath = None
    if kcoords is None:
        kpath = irrfbz_path(model.lattice, kline_density)
        kcoords = kpath.kcoords
    if n_bands is None:
        n_bands = scfres.eigenvalues.shape[1]

    bs_basis = PlaneWaveBasis(model, Ecut=basis.Ecut,
                              kgrid=ExplicitKpoints(list(kcoords)),
                              fft_size=basis.fft_size,
                              use_symmetries_for_kpoint_reduction=False)
    bd = bs_basis.data
    rho = scfres.rho
    Gcart = jnp.asarray(bs_basis.G_cube_cart)
    V, _ = hamops.total_potential(bs_basis.terms, rho, Gcart,
                                  model.unit_cell_volume)
    ham = hamops.build_ham(bd, bs_basis.terms.data, V)
    apply = lambda p: hamops.apply_H(ham, p, bs_basis.fft_size,
                                     model.unit_cell_volume)
    nb_compute = n_bands + 3
    X0 = random_orbitals(bs_basis, nb_compute)
    res = lobpcg(apply, X0, ham.kin, bd.mask, tol=tol, maxiter=maxiter,
                 n_conv=n_bands)
    eigenvalues = np.asarray(jax.device_get(res.eigenvalues))[:, :n_bands]
    return dict(basis=bs_basis, eigenvalues=eigenvalues,
                kcoords=np.asarray(kcoords), kpath=kpath,
                epsF=getattr(scfres, "epsF", None), psi=res.X,
                converged=bool(res.converged))
