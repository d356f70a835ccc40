"""External bridges: Wannier90 export, calculator interface, nbands."""
import numpy as np
import pytest

import dftk_tpu as dftk


@pytest.fixture(scope="module")
def si_scf():
    from testcases import make_silicon_model
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=6.0,
                                kgrid=dftk.MonkhorstPack((2, 2, 2)),
                                fft_size=(16,) * 3,
                                use_symmetries_for_kpoint_reduction=False)
    return dftk.self_consistent_field(basis, tol=1e-8, n_bands=6)


def test_wannier_export(si_scf, tmp_path):
    from dftk_tpu.external.wannier import write_wannier90_files
    files = write_wannier90_files(str(tmp_path / "si"), si_scf, n_wann=4,
                                  bands=4)
    win = (tmp_path / "si.win").read_text()
    assert "num_wann   4" in win and "begin kpoints" in win
    eig_lines = (tmp_path / "si.eig").read_text().strip().splitlines()
    assert len(eig_lines) == 8 * 4      # nk * nb
    mmn = (tmp_path / "si.mmn").read_text().splitlines()
    nb, nk, nnb = map(int, mmn[1].split())
    assert (nb, nk) == (4, 8) and nnb >= 6
    # overlaps of smooth periodic parts should have magnitude <= 1
    vals = np.array([float(x.split()[0]) for x in mmn[3:3 + 16]])
    assert np.all(np.abs(vals) <= 1.0 + 1e-6)


def test_calculator_state_reuse():
    from dftk_tpu.external.calculator import DFTCalculator
    from testcases import silicon
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])

    def builder(lattice, positions):
        return dftk.model_DFT(lattice, [Si, Si], positions,
                              functionals=["lda_x", "lda_c_vwn"])

    calc = DFTCalculator(builder, Ecut=5.0, kgrid=(1, 1, 1),
                         scf_kwargs=dict(tol=1e-7, maxiter=40))
    lat = silicon["lattice"]
    pos = silicon["positions"]
    E1 = calc.potential_energy(lat, pos)
    F1 = calc.forces(lat, pos)            # reuses the cached scfres
    assert calc.n_scf_calls == 1
    pos2 = [pos[0] + 0.01, pos[1]]
    E2 = calc.potential_energy(lat, pos2)
    assert calc.n_scf_calls == 2
    assert E2 > E1                        # displaced geometry is higher in E
    assert F1.shape == (2, 3)


def test_adaptive_bands_metal():
    from dftk_tpu.scf.nbands import AdaptiveBands
    from testcases import aluminium
    Al = dftk.ElementPsp.from_symbol("Al", psp=aluminium["psp"])
    model = dftk.model_DFT(aluminium["lattice"], [Al] * 4,
                           aluminium["positions"], functionals="LDA",
                           temperature=aluminium["temperature"])
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=(1, 2, 2),
                                fft_size=(24, 9, 9))
    res = dftk.self_consistent_field(basis, tol=1e-7,
                                     nbandsalg=AdaptiveBands(), maxiter=60)
    assert res.converged
    occ = res.occupation
    # top computed band must be (essentially) unoccupied
    assert np.max(occ[:, -1]) < 1e-6
