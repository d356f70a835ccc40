"""Plot helpers (reference ext/DFTKPlotsExt.jl counterpart)."""
import os

import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.postprocess.bands import compute_bands
from dftk_tpu.postprocess.plotting import (plot_bandstructure, plot_dos,
                                           plot_scf_convergence)

from testcases import make_silicon_model

matplotlib = pytest.importorskip("matplotlib")


@pytest.fixture(scope="module")
def si_res():
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(2, 2, 2))
    return dftk.self_consistent_field(b, tol=1e-8, maxiter=40)


def test_plot_bandstructure(tmp_path, si_res):
    bd = compute_bands(si_res, kline_density=4, n_bands=6)
    out = tmp_path / "bands.png"
    fig = plot_bandstructure(bd, unit="eV", path=str(out))
    assert out.exists() and out.stat().st_size > 1000
    assert len(fig.axes) == 1


def test_plot_dos(tmp_path, si_res):
    out = tmp_path / "dos.png"
    plot_dos(si_res, path=str(out), n_points=60, window=0.2)
    assert out.exists() and out.stat().st_size > 1000


def test_plot_scf_convergence(tmp_path, si_res):
    out = tmp_path / "scf.png"
    plot_scf_convergence(si_res, path=str(out))
    assert out.exists() and out.stat().st_size > 1000
