"""Interatomic force constants and phonons at q != 0.

The rigorous check is the block-diagonalization identity: the union of the
D(q) spectra over all supercell-commensurate q must equal the spectrum of
the full supercell Gamma dynamical matrix built from the same Phi(R) by
translation symmetry (the reference validates its DFPT against exactly
this supercell construction, test/phonon/).
"""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.postprocess.phonon import (ATOMIC_MASSES_U, AMU_TO_ME,
                                         compute_force_constants, dynmat_q,
                                         phonon_band_structure,
                                         phonon_modes_q)

from testcases import make_silicon_model


@pytest.fixture(scope="module")
def si_fc():
    m = make_silicon_model()
    return compute_force_constants(m, Ecut=4.0, supercell_size=(2, 1, 1),
                                   scf_kwargs=dict(tol=1e-9), delta=3e-2)


def test_asr_acoustic_modes(si_fc):
    f0, _ = phonon_modes_q(si_fc, [0, 0, 0])
    assert np.abs(f0[:3]).max() < 1e-6          # acoustic sum rule
    assert f0[3] > 0                            # optical modes real


def test_dynmat_hermitian_and_tr(si_fc):
    q = [0.3, 0.1, 0.2]
    D = dynmat_q(si_fc, q)
    assert np.abs(D - D.conj().T).max() < 1e-14
    fp, _ = phonon_modes_q(si_fc, q)
    fm, _ = phonon_modes_q(si_fc, [-x for x in q])
    np.testing.assert_allclose(fp, fm, atol=1e-12)   # time reversal


def test_commensurate_union_equals_supercell(si_fc):
    fc = si_fc
    na, n_cells = 2, 2
    size = np.array(fc.supercell)
    off_idx = {tuple(o): i for i, o in enumerate(fc.offsets)}
    C = np.zeros((n_cells, na, 3, n_cells, na, 3))
    for c1 in range(n_cells):
        for c2 in range(n_cells):
            rel = tuple((fc.offsets[c2] - fc.offsets[c1]) % size)
            C[c1, :, :, c2] = fc.Phi[:, :, off_idx[rel]]
    masses = np.array([ATOMIC_MASSES_U[at.symbol] * AMU_TO_ME
                       for at in fc.atoms])
    msq = np.sqrt(np.repeat(np.tile(masses, n_cells), 3))
    D_sc = C.reshape(6 * n_cells, 6 * n_cells) / np.outer(msq, msq)
    w2 = np.linalg.eigvalsh((D_sc + D_sc.T) / 2)
    sc_spec = np.sort(np.sign(w2) * np.sqrt(np.abs(w2)))

    union = np.sort(np.concatenate(
        [phonon_modes_q(fc, q)[0] for q in ([0, 0, 0], [0.5, 0, 0])]))
    np.testing.assert_allclose(union, sc_spec, atol=1e-9)


def test_phonon_band_structure(si_fc):
    bs = phonon_band_structure(si_fc, kline_density=5)
    f = bs["frequencies"]
    assert f.shape[0] == len(bs["qpath"].kcoords) and f.shape[1] == 6
    assert np.all(np.isfinite(f))
