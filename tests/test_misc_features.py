"""VCA pseudopotential mixes, density guesses, exporters, printers."""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.io.scfres import todict

from testcases import make_silicon_model


def silicon_setup(Ecut, kgrid):
    return dftk.PlaneWaveBasis(make_silicon_model(), Ecut=Ecut, kgrid=kgrid)


def test_psp_lincomb_endpoints_match():
    """VCA with x=0 must reproduce the pure element exactly."""
    Si = dftk.ElementPsp.from_symbol("Si")
    Ge = dftk.ElementPsp.from_symbol("Ge")
    vca = dftk.virtual_crystal_approximation(Si, Ge, 0.0)
    p = np.linspace(0.0, 8.0, 50)
    np.testing.assert_allclose(vca.psp.local_fourier(p),
                               Si.psp.local_fourier(p), rtol=1e-14)
    assert vca.psp.Zion == Si.psp.Zion
    assert vca.psp.n_proj() == Si.psp.n_proj() + Ge.psp.n_proj()
    # h blocks: the Ge block is scaled by 0 -> contributes nothing
    h0 = vca.psp.h[0]
    n0 = Si.psp.n_proj_radial(0)
    np.testing.assert_allclose(h0[:n0, :n0], np.asarray(Si.psp.h[0]))
    np.testing.assert_allclose(h0[n0:, n0:], 0.0)


def test_vca_scf_interpolates():
    """SiGe alloy energy lies between (and near the line of) Si and Ge."""
    a = 5.131570667152971
    lattice = np.array([[0, a, a], [a, 0, a], [a, a, 0]], dtype=float) * 1.05
    pos = [np.ones(3) / 8, -np.ones(3) / 8]
    Si = dftk.ElementPsp.from_symbol("Si")
    Ge = dftk.ElementPsp.from_symbol("Ge")

    def energy(el):
        model = dftk.model_DFT(lattice, [el, el], pos, functionals="LDA")
        basis = dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(1, 1, 1))
        return dftk.self_consistent_field(basis, tol=1e-7).energies["total"]

    E_si = energy(Si)
    E_ge = energy(Ge)
    E_mix = energy(dftk.virtual_crystal_approximation(Si, Ge, 0.5))
    lo, hi = min(E_si, E_ge), max(E_si, E_ge)
    assert lo - 0.2 < E_mix < hi + 0.2
    # VCA at the midpoint should be within ~100 mHa of the linear mix
    assert abs(E_mix - 0.5 * (E_si + E_ge)) < 0.2


def test_random_density_scf_converges():
    basis = silicon_setup(Ecut=7.0, kgrid=(1, 1, 1))
    rho0 = dftk.random_density(basis, seed=3)
    assert float(np.asarray(rho0).sum()) * basis.dvol == pytest.approx(
        basis.model.n_electrons)
    res = dftk.self_consistent_field(basis, rho=rho0, tol=1e-6, maxiter=40)
    ref = dftk.self_consistent_field(basis, tol=1e-6)
    assert res.converged
    assert res.energies["total"] == pytest.approx(ref.energies["total"],
                                                  abs=1e-5)


def test_vts_export(tmp_path):
    basis = silicon_setup(Ecut=6.0, kgrid=(1, 1, 1))
    res = dftk.self_consistent_field(basis, tol=1e-5)
    fname = tmp_path / "si.vts"
    dftk.save_scfres(str(fname), res)
    text = fname.read_text()
    assert "<VTKFile" in text and "StructuredGrid" in text
    assert 'Name="density"' in text
    # number of points = prod(fft_size)
    import re
    ext = re.search(r'WholeExtent="([\d ]+)"', text).group(1).split()
    dims = [int(ext[2 * i + 1]) + 1 for i in range(3)]
    assert tuple(dims) == basis.fft_size


def test_unk_files(tmp_path):
    from dftk_tpu.external.wannier import write_unk_files
    basis = silicon_setup(Ecut=6.0, kgrid=(1, 1, 1))
    res = dftk.self_consistent_field(basis, tol=1e-5)
    files = write_unk_files(res, dirname=str(tmp_path))
    assert len(files) == basis.n_kpoints
    with open(files[0]) as f:
        header = f.readline().split()
    assert tuple(int(x) for x in header[:3]) == basis.fft_size
    # norm of u on the grid ~ 1/sqrt(Omega) normalisation convention
    data = np.loadtxt(files[0], skiprows=1)
    n_grid = np.prod(basis.fft_size)
    u0 = (data[:n_grid, 0] + 1j * data[:n_grid, 1])
    norm = np.sum(np.abs(u0) ** 2) * basis.dvol
    assert norm == pytest.approx(1.0, rel=1e-6)


def test_repr_and_todict():
    basis = silicon_setup(Ecut=6.0, kgrid=(2, 2, 2))
    s = repr(basis.model)
    assert "n_electrons=8" in s and "lda" in s
    s = repr(basis)
    assert "Ecut=6.0" in s and "fft_size" in s
    d = todict(basis)
    import json
    json.dumps(d)   # must be serialisable
    assert d["model"]["n_electrons"] == 8
