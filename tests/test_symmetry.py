"""Symmetry engine: op detection, IBZ reduction, density symmetrization."""
import numpy as np
import jax.numpy as jnp

import dftk_tpu as dftk
from dftk_tpu.bzmesh import MonkhorstPack
from dftk_tpu.symmetry import (SymOp, irreducible_kcoords, lattice_point_group,
                               symmetry_operations)


def _si_setup():
    from testcases import make_silicon_model
    return make_silicon_model()


def test_silicon_has_48_ops():
    model = _si_setup()
    assert len(model.symmetries) == 48


def test_ops_form_group():
    model = _si_setup()
    ops = model.symmetries
    keys = {(op.W, tuple(np.round(np.array(op.w) * 1e6).astype(int)))
            for op in ops}
    for a in ops[:8]:
        for b in ops[:8]:
            W = a.Wmat @ b.Wmat
            w = a.wvec + a.Wmat @ b.wvec
            c = SymOp.make(W, w)
            k = (c.W, tuple(np.round(np.array(c.w) * 1e6).astype(int)))
            assert k in keys


def test_cubic_point_group():
    ops = lattice_point_group(np.eye(3))
    assert len(ops) == 48


def test_triclinic_has_only_inversion():
    lattice = np.array([[1.0, 0.1, 0.2], [0.0, 1.3, 0.15], [0.0, 0.0, 1.7]])
    ops = lattice_point_group(lattice)
    assert len(ops) == 2  # identity + inversion


def test_mp_ibz_reduction_silicon():
    model = _si_setup()
    mp = MonkhorstPack((3, 3, 3))
    kcoords, weights = mp.irreducible_kcoords(model.symmetries)
    assert abs(weights.sum() - 1.0) < 1e-14
    # 3x3x3 in the fcc primitive cell reduces to 4 points with these weights
    assert len(kcoords) == 4
    assert sorted(np.round(weights * 27).astype(int).tolist()) == [1, 6, 8, 12]


def test_mp_444_reduction_silicon():
    model = _si_setup()
    mp = MonkhorstPack((4, 4, 4))
    kcoords, weights = mp.irreducible_kcoords(model.symmetries)
    assert len(kcoords) == 10   # textbook IBZ count for fcc 4x4x4 (no TRS needed)
    assert abs(weights.sum() - 1.0) < 1e-14


def test_density_symmetrization_projector():
    """Symmetrizing twice == symmetrizing once, and it preserves the integral."""
    from dftk_tpu.ops.density import make_symmetrizer
    from testcases import silicon
    model = _si_setup()
    basis = dftk.PlaneWaveBasis(model, Ecut=6.0, kgrid=silicon["kgrid"],
                                fft_size=(16, 16, 16))
    sym = make_symmetrizer(basis)
    rng = np.random.default_rng(0)
    rho = jnp.asarray(np.abs(rng.normal(size=(1,) + basis.fft_size)))
    r1 = sym(rho)
    r2 = sym(r1)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-10)
    assert abs(float(jnp.sum(r1) - jnp.sum(rho))) / float(jnp.sum(rho)) < 1e-10
