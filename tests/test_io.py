"""Serialization round-trips (save_scfres / load_scfres)."""
import numpy as np
import pytest

import dftk_tpu as dftk
from dftk_tpu.io.scfres import load_scfres, save_scfres


def test_scfres_roundtrip(tmp_path):
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=silicon["kgrid"],
                                fft_size=(15, 15, 15))
    res = dftk.self_consistent_field(basis, tol=1e-7, is_converged="energy")

    fn = tmp_path / "scfres.npz"
    save_scfres(fn, res)
    loaded = load_scfres(fn)
    assert abs(loaded["energies"]["total"] - res.total_energy) < 1e-14
    np.testing.assert_allclose(loaded["rho"], np.asarray(res.rho), atol=1e-14)
    assert loaded["basis"].fft_size == basis.fft_size

    # resume: restart SCF from the checkpoint, should converge immediately
    res2 = dftk.self_consistent_field(
        loaded["basis"], tol=1e-7, is_converged="energy",
        rho=dftk.guess_density(loaded["basis"]) * 0 + loaded["rho"],
        psi=loaded["psi"])
    assert res2.n_iter <= 2
    assert abs(res2.total_energy - res.total_energy) < 1e-8


def test_json_summary(tmp_path):
    from testcases import make_silicon_model, silicon
    model = make_silicon_model()
    basis = dftk.PlaneWaveBasis(model, Ecut=5.0, kgrid=silicon["kgrid"],
                                fft_size=(15, 15, 15))
    res = dftk.self_consistent_field(basis, tol=1e-6, is_converged="energy")
    fn = tmp_path / "scfres.json"
    save_scfres(fn, res)
    import json
    meta = json.loads(fn.read_text())
    assert "energies" in meta and "total" in meta["energies"]
