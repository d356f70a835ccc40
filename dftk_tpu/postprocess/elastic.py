"""Elastic constants: C = d sigma / d strain (Voigt 6x6).

The reference differentiates the stress through the SCF fixed point with
ForwardDiff (DFTK `src/postprocess/elastic.jl`).  Here: central finite
differences of the autodiff stress over strained, re-converged SCF
solutions (clamped-ion; add ion relaxation by re-optimizing positions at
each strain for the relaxed-ion tensor).
"""
import numpy as np

_VOIGT = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]


def _strain_matrix(voigt_index, eps):
    e = np.zeros((3, 3))
    i, j = _VOIGT[voigt_index]
    if i == j:
        e[i, j] = eps
    else:
        e[i, j] = e[j, i] = eps / 2
    return e


def elastic_tensor(make_basis, lattice0, scf_kwargs=None, eps=1e-4,
                   components=None):
    """Clamped-ion elastic tensor C_ab (Voigt, Ha/bohr^3).

    make_basis(lattice) -> PlaneWaveBasis (positions fixed in fractional
    coordinates - clamped ion).
    """
    import dftk_tpu as dftk
    from .stresses import compute_stresses_cart
    scf_kwargs = dict(scf_kwargs or {})
    scf_kwargs.setdefault("tol", 1e-10)
    lattice0 = np.asarray(lattice0, dtype=float)
    if components is None:
        components = range(6)

    def stress_at(strain):
        L = (np.eye(3) + strain) @ lattice0
        basis = make_basis(L)
        res = dftk.self_consistent_field(basis, **scf_kwargs)
        return compute_stresses_cart(res)

    C = np.zeros((6, 6))
    for b in components:
        sp = stress_at(_strain_matrix(b, +eps))
        sm = stress_at(_strain_matrix(b, -eps))
        dsig = (sp - sm) / (2 * eps)
        for a in range(6):
            i, j = _VOIGT[a]
            C[a, b] = dsig[i, j]
    # symmetrize over computed components
    comp = list(components)
    if len(comp) == 6:
        C = (C + C.T) / 2
    return C


def bulk_modulus(C):
    """Voigt-average bulk modulus from the elastic tensor (Ha/bohr^3)."""
    return (C[0, 0] + C[1, 1] + C[2, 2]
            + 2 * (C[0, 1] + C[0, 2] + C[1, 2])) / 9
