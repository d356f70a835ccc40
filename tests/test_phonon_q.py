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


# ---------------------------------------------------------------------------
# Analytic (DFPT) dynamical matrices at q != 0  (VERDICT #5)
# ---------------------------------------------------------------------------

import dftk_tpu as dftk
from dftk_tpu.response.phonon_dfpt import dynmat_dfpt_gamma
from dftk_tpu.response.phonon_q import (dynmat_dfpt_q, dynmat_ewald_q,
                                        phonon_modes_dfpt_q)


def _si_scf(Ecut=6.0, kgrid=(2, 2, 2)):
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=kgrid)
    return dftk.self_consistent_field(b, tol=1e-12, maxiter=60)


def test_qcode_at_gamma_matches_gamma_code():
    res = _si_scf(Ecut=4.0)
    C0q = dynmat_dfpt_q(res, [0, 0, 0], tol=1e-8, sternheimer_tol=1e-11)
    C0 = dynmat_dfpt_gamma(res, tol=1e-8, sternheimer_tol=1e-11,
                           acoustic_sum_rule=False)
    assert np.abs(C0q.imag).max() < 1e-10
    assert np.abs(C0q.real - C0).max() < 1e-9


def test_dynmat_q_hermitian_time_reversal():
    res = _si_scf(Ecut=4.0)
    q = [0.5, 0.0, 0.0]
    Dq = dynmat_dfpt_q(res, q, tol=1e-8, sternheimer_tol=1e-11)
    assert np.abs(Dq - Dq.conj().T).max() < 1e-10
    Dmq = dynmat_dfpt_q(res, [-x for x in q], tol=1e-8,
                        sternheimer_tol=1e-11)
    assert np.abs(Dmq - Dq.conj()).max() < 1e-7       # time reversal


def test_ewald_dynmat_q_supercell_fold():
    """Analytic Ewald D(q) vs the exact supercell-hessian fold at X."""
    import jax
    import jax.numpy as jnp
    from dftk_tpu.ops.ewald import energy_ewald
    a = 5.13
    L = np.array([[0, a, a], [a, 0, a], [a, a, 0]])
    pos = np.array([[0.125, 0.125, 0.125], [-0.125, -0.125, -0.125]])
    Z = np.array([4.0, 4.0])
    S = np.diag([2, 1, 1]).astype(float)
    Ls = L @ S
    pos_s = np.array([np.linalg.solve(S, p + np.array([c, 0, 0]))
                      for c in range(2) for p in pos])
    Zs = np.array([4.0] * 4)
    H = np.asarray(jax.hessian(
        lambda p: energy_ewald(Ls, Zs, p))(jnp.asarray(pos_s)))
    Linv_s = np.linalg.inv(Ls)
    Hc = np.einsum("aA,satb,bB->sAtB", Linv_s, H, Linv_s)
    D_fold = Hc[:2, :, :2, :] - Hc[:2, :, 2:, :]      # e^{iqR}, R=(1,0,0)
    q = np.array([0.5, 0, 0])
    D_q = dynmat_ewald_q(L, Z, pos, q)
    ph = np.exp(2j * np.pi * (pos @ q))
    D_gauge = np.einsum("a,aibj,b->aibj", ph, D_q, ph.conj())
    assert np.abs(D_gauge - D_fold).max() < 1e-10


@pytest.mark.slow
def test_dfpt_q_matches_ifc_at_X():
    """The VERDICT #5 'Done' criterion: analytic D(q) frequencies at the
    zone boundary agree with the supercell finite-difference IFC route."""
    m = make_silicon_model()
    fc = compute_force_constants(m, Ecut=6.0, supercell_size=(2, 1, 1),
                                 kgrid=(1, 2, 2),
                                 scf_kwargs=dict(tol=1e-11), delta=2e-2)
    q = [0.5, 0.0, 0.0]
    f_ifc, _ = phonon_modes_q(fc, q)
    res = _si_scf(Ecut=6.0, kgrid=(2, 2, 2))
    f_dfpt, _ = phonon_modes_dfpt_q(res, q, tol=1e-8, sternheimer_tol=1e-11)
    assert np.abs(f_dfpt - f_ifc).max() < 1e-5


@pytest.mark.slow
def test_dfpt_q_metallic_matches_ifc():
    """Metallic q != 0 DFPT (magnesium, T=0.01): divided-difference pairs
    across (k, k+q) vs the finite-difference IFC route."""
    from testcases import magnesium
    Mg = dftk.ElementPsp.from_symbol("Mg", psp=magnesium["psp"])
    m = dftk.model_DFT(magnesium["lattice"], [Mg, Mg],
                       magnesium["positions"],
                       functionals=["lda_x", "lda_c_vwn"],
                       temperature=magnesium["temperature"])
    fc = compute_force_constants(
        m, Ecut=5.0, supercell_size=(2, 1, 1), kgrid=(1, 2, 2),
        scf_kwargs=dict(tol=1e-11, n_bands=12, n_extra_bands=6),
        delta=2e-2)
    q = [0.5, 0.0, 0.0]
    f_ifc, _ = phonon_modes_q(fc, q)
    b = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(2, 2, 2))
    res = dftk.self_consistent_field(b, tol=1e-12, maxiter=80,
                                     n_bands=6, n_extra_bands=4)
    f_dfpt, _ = phonon_modes_dfpt_q(res, q, tol=1e-8,
                                    sternheimer_tol=1e-11)
    assert np.abs(f_dfpt - f_ifc).max() < 2e-5, (f_dfpt, f_ifc)
