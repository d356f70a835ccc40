"""Structure readers, psp registry, model builders."""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.external.structure import (ANGSTROM_TO_BOHR, build_model,
                                         read_poscar, read_xyz)

POSCAR = """Si diamond
1.0
  0.0 2.715 2.715
  2.715 0.0 2.715
  2.715 2.715 0.0
Si
2
Direct
 0.125 0.125 0.125
 -0.125 -0.125 -0.125
"""


def test_read_poscar_direct():
    s = read_poscar(POSCAR)
    assert s["symbols"] == ["Si", "Si"]
    np.testing.assert_allclose(s["lattice"][0, 1], 2.715 * ANGSTROM_TO_BOHR)
    m = build_model(s, functionals="LDA")
    assert m.n_electrons == 8
    assert len(m.symmetries) == 48


def test_read_poscar_cartesian_and_scale():
    text = ("c\n2.0\n1 0 0\n0 1 0\n0 0 1\nHe\n1\nCartesian\n0.5 0.5 0.5\n")
    s = read_poscar(text)
    # cartesian coords are scaled by the universal factor too (VASP rule)
    np.testing.assert_allclose(np.asarray(s["positions"][0]), 0.5)


def test_read_xyz_lattice_and_molecular():
    xyz = ('3\nw Lattice="10 0 0  0 10 0  0 0 10"\n'
           "O 5.0 5.0 5.0\nH 5.757 5.586 5.0\nH 4.243 5.586 5.0\n")
    s = read_xyz(xyz)
    np.testing.assert_allclose(np.asarray(s["positions"][0]), 0.5)
    s2 = read_xyz("1\nc\nHe 3.0 -1.0 2.0\n", box_length=12.0)
    np.testing.assert_allclose(np.asarray(s2["positions"][0]), 0.5)


def test_psp_registry():
    ids = dftk.list_psp(element="Si")
    assert "hgh/lda/si-q4" in ids and "hgh/pbe/si-q4" in ids
    assert dftk.list_psp(family="pbe", element="Si") == ["hgh/pbe/si-q4"]
    p = dftk.load_psp("hgh/pbe/si-q4")
    assert p.Zion == 4 and "pbe" in p.identifier
    el = dftk.ElementPsp.from_symbol("Si", family="pbe")
    assert "pbe" in el.psp.identifier
    with pytest.raises(KeyError):
        dftk.load_psp("hgh/lda/unobtanium-q9")
