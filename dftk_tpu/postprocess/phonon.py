"""Phonon modes.

Two routes (reference: DFTK `src/postprocess/phonon.jl` via DFPT):
  * `phonon_modes_finite_diff`: Gamma-point dynamical matrix from central
    finite differences of the autodiff forces (the supercell method the
    reference's own phonon tests compare DFPT against, test/phonon/).
  * DFPT route (q != 0) comes with the delta-H machinery in a later round;
    the chi_0 / Dyson infrastructure it needs is in response/.

Returns frequencies in Hartree atomic units (multiply by
HARTREE_TO_CM1 = 219474.63 for cm^-1).
"""
import numpy as np

import dataclasses

HARTREE_TO_CM1 = 219474.6313632

# Atomic masses (u) for the common elements; 1 u = 1822.888486 m_e
ATOMIC_MASSES_U = {
    "H": 1.008, "He": 4.0026, "Li": 6.94, "Be": 9.0122, "B": 10.81,
    "C": 12.011, "N": 14.007, "O": 15.999, "F": 18.998, "Ne": 20.180,
    "Na": 22.990, "Mg": 24.305, "Al": 26.982, "Si": 28.085, "P": 30.974,
    "S": 32.06, "Cl": 35.45, "Ar": 39.948, "K": 39.098, "Ca": 40.078,
    "Ti": 47.867, "V": 50.942, "Cr": 51.996, "Mn": 54.938, "Fe": 55.845,
    "Co": 58.933, "Ni": 58.693, "Cu": 63.546, "Zn": 65.38, "Ga": 69.723,
    "Ge": 72.630, "As": 74.922, "Se": 78.971, "Sr": 87.62, "Sn": 118.71,
    "Sb": 121.76, "Ba": 137.33, "Pt": 195.08,
}
AMU_TO_ME = 1822.888486209


def compute_dynmat_finite_diff(make_basis, positions0, scf_kwargs=None,
                               delta=1e-3):
    """Cartesian force-constant matrix d^2 E / dR_cart^2 by central FD.

    make_basis(positions) -> PlaneWaveBasis with those fractional positions.
    Returns dynmat [n_atoms*3, n_atoms*3] (Cartesian, not mass-weighted).
    """
    import dftk_tpu as dftk
    from .forces import compute_forces_cart
    scf_kwargs = dict(scf_kwargs or {})
    scf_kwargs.setdefault("tol", 1e-10)

    basis0 = make_basis(positions0)
    lattice = basis0.model.lattice
    inv_lat = np.linalg.inv(lattice)
    na = len(positions0)
    C = np.zeros((3 * na, 3 * na))
    for s in range(na):
        for alpha in range(3):
            forces = []
            for sign in (+1, -1):
                pos = [np.array(p, dtype=float) for p in positions0]
                # displace atom s along Cartesian alpha
                disp_red = inv_lat @ (sign * delta * np.eye(3)[alpha])
                pos[s] = pos[s] + disp_red
                basis = make_basis(pos)
                res = dftk.self_consistent_field(basis, **scf_kwargs)
                forces.append(compute_forces_cart(res))
            dF = (forces[0] - forces[1]) / (2 * delta)   # [na, 3]
            C[:, 3 * s + alpha] = (-dF).reshape(-1)
    # symmetrize + acoustic sum rule
    C = (C + C.T) / 2
    for a in range(3):
        for b in range(3):
            blocks = C.reshape(na, 3, na, 3)
            diag_corr = blocks[:, a, :, b].sum(axis=1)
            for s in range(na):
                blocks[s, a, s, b] -= diag_corr[s]
    return C


def phonon_modes_from_dynmat(C, atoms):
    """Mass-weight a Cartesian force-constant matrix and diagonalize.

    Returns (frequencies [3 na] in Ha, mass-weighted eigenvectors).
    Imaginary frequencies are returned as negative numbers.
    """
    masses = np.array([ATOMIC_MASSES_U[at.symbol] * AMU_TO_ME
                       for at in atoms])
    msqrt = np.repeat(np.sqrt(masses), 3)
    D = C / np.outer(msqrt, msqrt)
    w2, vecs = np.linalg.eigh((D + D.T) / 2)
    freqs = np.sign(w2) * np.sqrt(np.abs(w2))
    return freqs, vecs


def phonon_modes_finite_diff(make_basis, positions0, atoms, scf_kwargs=None,
                             delta=1e-3):
    C = compute_dynmat_finite_diff(make_basis, positions0,
                                   scf_kwargs=scf_kwargs, delta=delta)
    return phonon_modes_from_dynmat(C, atoms)
