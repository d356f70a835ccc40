"""Band structures, DOS, LDOS, PDOS."""
import numpy as np
import pytest

import dftk_tpu as dftk


@pytest.fixture(scope="module")
def si_scf():
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                                fft_size=(17,) * 3)
    return dftk.self_consistent_field(basis, tol=1e-8, n_bands=8)


def test_band_structure_silicon(si_scf):
    bands = dftk.compute_bands(si_scf, n_bands=6, kline_density=6)
    assert bands["converged"]
    ev = bands["eigenvalues"]
    assert ev.shape[1] == 6
    # valence bands below Fermi level, conduction above (silicon gap)
    assert np.all(ev[:, 3] < si_scf.epsF + 0.05)
    assert np.all(ev[:, 4] > si_scf.epsF - 0.05)
    # gamma point: triply degenerate valence-band top
    kpath = bands["kpath"]
    ig = [i for i, l in kpath.labels.items() if l == "G"][0]
    vb = ev[ig, 1:4]
    assert np.ptp(vb) < 1e-4


def test_dos_integrates_to_electron_count(si_scf):
    from dftk_tpu.postprocess.dos import compute_dos
    basis = si_scf.basis
    # integrate the DOS over the valence bands only (stop at mid-gap)
    eps = np.linspace(-0.5, si_scf.epsF, 800)
    dos = compute_dos(eps, basis, si_scf.eigenvalues, temperature=2e-3)
    n_elec = np.trapezoid(dos, eps)
    assert abs(n_elec - 8.0) < 0.1


def test_pdos_silicon():
    import os
    UPF = str(__import__("pathlib").Path(__file__).parent / "data/pseudos/gth/Si.pbe-hgh.upf")
    if not os.path.exists(UPF):
        pytest.skip("reference UPF not available")
    from testcases import silicon
    from dftk_tpu.postprocess.dos import compute_pdos
    Si = dftk.ElementPsp.from_symbol("Si", psp=UPF)
    model = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                           functionals="PBE")
    basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=silicon["kgrid"],
                                fft_size=(17,) * 3)
    res = dftk.self_consistent_field(basis, tol=1e-7, n_bands=8)
    # probe exactly at the Gamma-point band edges
    e_bottom = float(res.eigenvalues[0, 0])     # VB bottom: s-dominated
    e_top = float(res.eigenvalues[0, 3])        # VB top: p-dominated
    eps = np.array([e_bottom, e_top])
    pdos = compute_pdos(eps, basis, res.eigenvalues, res.psi)
    assert len(pdos) == 4     # 3s + 3p per atom
    s_labels = [k for k in pdos if "_l0_" in k]
    p_labels = [k for k in pdos if "_l1_" in k]
    s_b = sum(pdos[k][0] for k in s_labels)
    p_b = sum(pdos[k][0] for k in p_labels)
    s_t = sum(pdos[k][1] for k in s_labels)
    p_t = sum(pdos[k][1] for k in p_labels)
    assert s_b > p_b          # band bottom s-dominated
    assert p_t > s_t          # band top p-dominated
