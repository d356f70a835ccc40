"""BZ unfolding and Setyawan-Curtarolo paths for all Bravais classes."""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.ops.density import compute_density
from dftk_tpu.postprocess.bands import detect_bravais, irrfbz_path

from testcases import make_silicon_model


def test_unfold_bz_matches_direct():
    """Unfolded IBZ scfres == quantities of a symmetry-free calculation."""
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=7.0, kgrid=(2, 2, 2))
    assert b.n_irreducible_kpoints < len(b.kgrid.reducible_kcoords())
    res = dftk.self_consistent_field(b, tol=1e-9)

    res_u = dftk.unfold_bz(res)
    bu = res_u.basis
    assert bu.n_kpoints == len(b.kgrid.reducible_kcoords())
    assert np.allclose(bu.kweights, 1.0 / bu.n_kpoints)

    # eigenvalues match a direct full-BZ SCF at every reducible k
    b2 = dftk.PlaneWaveBasis(m, Ecut=7.0, kgrid=(2, 2, 2),
                             use_symmetries_for_kpoint_reduction=False)
    res2 = dftk.self_consistent_field(b2, tol=1e-9)

    def canon(k):
        return tuple(np.round((k - np.round(k)) * 1e6).astype(int))
    map2 = {canon(k): i for i, k in enumerate(b2.kcoords)}
    for ik, k in enumerate(bu.kcoords):
        j = map2[canon(k)]
        np.testing.assert_allclose(res_u.eigenvalues[ik, :4],
                                   res2.eigenvalues[j, :4], atol=1e-7)

    # unfolded orbitals stay orthonormal
    ps = np.asarray(res_u.psi)
    for ik in range(bu.n_kpoints):
        n = int(bu.nG_per_k[ik])
        O = np.conj(ps[ik, :, :n]) @ ps[ik, :, :n].T
        assert np.abs(O - np.eye(O.shape[0])).max() < 1e-8

    # density recomputed from unfolded orbitals (NO symmetrization) equals
    # the symmetrized SCF density - the defining property of unfolding
    rho_u = np.asarray(compute_density(
        bu.data, res_u.psi, res_u.occupation, bu.fft_size,
        m.unit_cell_volume, m.n_spin_components))
    assert np.abs(rho_u - np.asarray(res.rho)).max() < 1e-8


def _rhl(alpha_deg, a=5.0):
    c = np.cos(np.deg2rad(alpha_deg))
    M = a * a * np.array([[1, c, c], [c, 1, c], [c, c, 1]])
    return np.linalg.cholesky(M).T


_LATTICES = {
    "cubic": 5.0 * np.eye(3),
    "fcc": np.array([[0, 2.5, 2.5], [2.5, 0, 2.5], [2.5, 2.5, 0]], float),
    "bcc": 2.5 * np.array([[-1, 1, 1], [1, -1, 1], [1, 1, -1]], float),
    "hexagonal": np.array([[4, 0, 0], [-2, 2 * np.sqrt(3), 0],
                           [0, 0, 6]], float).T,
    "tet": np.diag([4.0, 4.0, 6.0]),
    "orc": np.diag([4.0, 5.0, 6.0]),
    "bct1": np.array([[-2.5, 2.5, 1.5], [2.5, -2.5, 1.5],
                      [2.5, 2.5, -1.5]], float).T,
    "bct2": np.array([[-1.5, 1.5, 2.5], [1.5, -1.5, 2.5],
                      [1.5, 1.5, -2.5]], float).T,
    "rhl1": _rhl(55.0),
    "rhl2": _rhl(110.0),
    "mcl": np.array([[3, 0, 0], [0, 4, 0],
                     [0, 6 * np.cos(np.deg2rad(75)),
                      6 * np.sin(np.deg2rad(75))]], float).T,
    "tri": np.array([[4.0, 0.3, 0.2], [0.1, 5.0, 0.4],
                     [0.2, 0.1, 6.0]], float).T,
}


@pytest.mark.parametrize("brav", sorted(_LATTICES))
def test_bravais_paths(brav):
    L = _LATTICES[brav]
    assert detect_bravais(L) == brav
    kp = irrfbz_path(L, kline_density=10)
    assert len(kp.kcoords) == len(kp.kdistances)
    assert np.all(np.diff(kp.kdistances) >= -1e-12)   # monotone incl. breaks
    assert 0 in kp.labels and (len(kp.kcoords) - 1) in kp.labels
