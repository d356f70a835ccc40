"""Cell standardization: primitive finding + Minkowski reduction."""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.standardize import minkowski_reduce, standardize_atoms
from dftk_tpu.supercell import create_supercell

from testcases import silicon


def _si():
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    return silicon["lattice"], [Si, Si], silicon["positions"]


def test_supercell_back_to_primitive():
    lattice, atoms, pos = _si()
    sc = create_supercell(lattice, atoms, pos, (2, 2, 1))
    out = standardize_atoms(sc["lattice"], sc["atoms"], sc["positions"])
    assert len(out["atoms"]) == 2
    np.testing.assert_allclose(abs(np.linalg.det(out["lattice"])),
                               abs(np.linalg.det(lattice)), rtol=1e-10)
    # standardized cell gives the same physics
    m = dftk.model_DFT(out["lattice"], out["atoms"], out["positions"],
                       functionals="LDA")
    assert len(m.symmetries) == 48


def test_conventional_cubic_to_fcc_primitive():
    a_conv = 2 * silicon["lattice"][0, 1]
    conv = np.eye(3) * a_conv
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    cpos = [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
            [.25, .25, .25], [.75, .75, .25], [.75, .25, .75],
            [.25, .75, .75]]
    out = standardize_atoms(conv, [Si] * 8, [np.array(p) for p in cpos])
    assert len(out["atoms"]) == 2
    lengths = np.linalg.norm(out["lattice"], axis=0)
    np.testing.assert_allclose(lengths, a_conv / np.sqrt(2), rtol=1e-10)


def test_already_primitive_unchanged():
    lattice, atoms, pos = _si()
    out = standardize_atoms(lattice, atoms, pos)
    assert len(out["atoms"]) == 2
    np.testing.assert_allclose(abs(np.linalg.det(out["lattice"])),
                               abs(np.linalg.det(lattice)), rtol=1e-10)


def test_minkowski_reduce():
    lattice = silicon["lattice"].copy()
    skew = lattice.copy()
    skew[:, 0] += 5 * skew[:, 1] - 3 * skew[:, 2]
    red = minkowski_reduce(skew)
    np.testing.assert_allclose(abs(np.linalg.det(red)),
                               abs(np.linalg.det(lattice)), rtol=1e-10)
    assert np.linalg.norm(red, axis=0).max() \
        <= np.linalg.norm(lattice, axis=0).max() + 1e-9
