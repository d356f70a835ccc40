"""Solver cross-validation (the reference's scf_compare strategy):
density mixing, potential mixing, Newton, and direct minimization must all
reach the same ground state."""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.scf.newton import newton
from dftk_tpu.scf.potential_mixing import scf_potential_mixing


@pytest.fixture(scope="module")
def si_basis():
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    return dftk.PlaneWaveBasis(model, Ecut=6.0, kgrid=silicon["kgrid"],
                               fft_size=(16,) * 3)


def test_potential_mixing_matches_density_mixing(si_basis):
    r1 = dftk.self_consistent_field(si_basis, tol=1e-10, maxiter=50)
    r2 = scf_potential_mixing(si_basis, tol=1e-9, maxiter=60)
    assert r2.converged
    assert abs(r1.total_energy - r2.total_energy) < 5e-7


def test_newton_matches_scf_unsymmetrized():
    # Newton works on the plain variational functional: compare on a full
    # (unreduced) k-grid where symmetrization is immaterial
    from testcases import make_silicon_model
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=6.0,
                                kgrid=dftk.MonkhorstPack((2, 2, 2)),
                                fft_size=(16,) * 3,
                                use_symmetries_for_kpoint_reduction=False)
    r1 = dftk.self_consistent_field(basis, tol=1e-11, maxiter=50)
    r2 = newton(basis, tol=1e-12, maxiter=12)
    assert r2.converged
    assert r2.n_iter <= 8     # quadratic convergence
    assert abs(r1.total_energy - r2.total_energy) < 5e-7


def test_hubbard_term():
    import os
    UPF = str(__import__("pathlib").Path(__file__).parent / "data/pseudos/gth/Si.pbe-hgh.upf")
    if not os.path.exists(UPF):
        pytest.skip("reference UPF not available")
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=UPF)
    mfs = (dftk.HubbardManifold(atom_index=0, l=1, U=0.1),
           dftk.HubbardManifold(atom_index=1, l=1, U=0.1))
    m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                       functionals="PBE",
                       extra_terms=[dftk.Hubbard(manifolds=mfs)])
    b = dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=silicon["kgrid"],
                            fft_size=(16,) * 3)
    r = dftk.self_consistent_field(b, tol=1e-7, maxiter=40,
                                   is_converged="energy")
    assert r.converged
    assert 0 < r.energies["Hubbard"] < 0.2   # penalises partial p occupation


def test_hubbard_occupation_symmetrization():
    """IBZ occupation matrix + symmetrization == full-BZ occupation matrix."""
    import os
    UPF = str(__import__("pathlib").Path(__file__).parent / "data/pseudos/gth/Si.pbe-hgh.upf")
    if not os.path.exists(UPF):
        pytest.skip("reference UPF not available")
    from testcases import silicon
    from dftk_tpu.ops.hubbard import (build_hubbard_projectors,
                                      build_occupation_symmetrization,
                                      occupation_matrix,
                                      symmetrize_occupation_matrix)
    Si = dftk.ElementPsp.from_symbol("Si", psp=UPF)
    mfs = (dftk.HubbardManifold(atom_index=0, l=1, U=0.15),
           dftk.HubbardManifold(atom_index=1, l=1, U=0.15))
    m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                       functionals="PBE",
                       extra_terms=[dftk.Hubbard(manifolds=mfs)])
    b1 = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(2, 2, 2), fft_size=(15,) * 3)
    b2 = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(2, 2, 2), fft_size=(15,) * 3,
                             use_symmetries_for_kpoint_reduction=False)
    assert b1.n_irreducible_kpoints < b2.n_kpoints
    r1 = dftk.self_consistent_field(b1, tol=1e-9, maxiter=60)
    r2 = dftk.self_consistent_field(b2, tol=1e-9, maxiter=60)
    assert abs(r1.total_energy - r2.total_energy) < 1e-7
    assert abs(r1.energies["Hubbard"] - r2.energies["Hubbard"]) < 1e-6

    P1, sl1 = build_hubbard_projectors(b1, mfs)
    plan = build_occupation_symmetrization(b1, mfs, sl1)
    n1 = occupation_matrix(P1, r1.psi, r1.occupation, b1.data.kweights,
                           b1.data.kspin, 1)
    n1s = np.asarray(symmetrize_occupation_matrix(n1, sl1, plan))
    P2, sl2 = build_hubbard_projectors(b2, mfs)
    n2 = np.asarray(occupation_matrix(P2, r2.psi, r2.occupation,
                                      b2.data.kweights, b2.data.kspin, 1))
    # unsymmetrized IBZ matrices differ from the full-BZ ones by ~0.5;
    # after symmetrization they agree to SCF-convergence noise
    for (a, bnd) in sl1:
        assert np.abs(n1s[0, a:bnd, a:bnd] - n2[0, a:bnd, a:bnd]).max() < 1e-6


def test_ldos_mixing_matches_kerker():
    """LdosMixing (chi0-model) converges a metal to the Kerker answer."""
    from testcases import iron_bcc
    from dftk_tpu.scf.mixing import KerkerMixing, LdosMixing
    Fe = dftk.ElementPsp.from_symbol("Fe", psp=iron_bcc["psp"])
    m = dftk.model_DFT(iron_bcc["lattice"], [Fe], iron_bcc["positions"],
                       functionals="LDA", temperature=iron_bcc["temperature"],
                       smearing=dftk.Smearing.Gaussian())
    b = dftk.PlaneWaveBasis(m, Ecut=10.0, kgrid=(2, 2, 2))
    r1 = dftk.self_consistent_field(b, tol=1e-8, mixing=KerkerMixing())
    r2 = dftk.self_consistent_field(b, tol=1e-8, mixing=LdosMixing())
    assert r1.converged and r2.converged
    assert abs(r1.total_energy - r2.total_energy) < 1e-7
    # the chi0-model should not be dramatically slower than Kerker here
    assert r2.n_iter <= r1.n_iter + 15


# ---------------------------------------------------------------------------
# chi0-model mixing breadth (reference mixing.jl:54-233, chi0models.jl:45)
# ---------------------------------------------------------------------------

def _al_basis():
    a = 7.65339
    lattice = a / 2 * np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
    Al = dftk.ElementPsp.from_symbol("Al", psp="lda/al-q3")
    m = dftk.model_DFT(lattice, [Al], [np.zeros(3)],
                       functionals=["lda_x", "lda_c_vwn"], temperature=1e-2)
    return dftk.PlaneWaveBasis(m, Ecut=6.0, kgrid=(2, 2, 2))


def test_hybrid_and_kerkerdos_mixing_converge_to_same_energy():
    b = _al_basis()
    E = {}
    for name, mx in (("kerker", dftk.KerkerMixing()),
                     ("hybrid", dftk.HybridMixing(epsilon_r=2.0)),
                     ("kerkerdos", dftk.KerkerDosMixing())):
        res = dftk.self_consistent_field(b, tol=1e-9, maxiter=60, mixing=mx)
        assert res.converged, name
        E[name] = res.total_energy
    assert abs(E["hybrid"] - E["kerker"]) < 1e-7
    assert abs(E["kerkerdos"] - E["kerker"]) < 1e-7


def test_exact_chi0_mixing_converges():
    """Applychi0Model parity: the exact-Sternheimer chi0 inside the mixing.
    Small silicon so the per-iteration Sternheimer cost stays low."""
    from testcases import make_silicon_model
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(1, 1, 1))
    ref = dftk.self_consistent_field(b, tol=1e-9, maxiter=60)
    res = dftk.self_consistent_field(b, tol=1e-9, maxiter=40,
                                     mixing=dftk.Chi0Mixing())
    assert res.converged
    assert abs(res.total_energy - ref.total_energy) < 1e-7
