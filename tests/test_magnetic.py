"""Magnetic A.(-i grad) term against the exact Fock-Darwin spectrum.

A charged particle in a 2D harmonic trap (omega0) and a uniform
perpendicular field B (symmetric gauge) has E(n, m) =
(2n + |m| + 1) Omega - m B / 2 with Omega = sqrt(omega0^2 + B^2/4) --
an exact target for the Magnetic term (+ the |A|^2/2 diamagnetic piece,
added as an external potential exactly like the reference, whose Magnetic
term is also the cross term only, src/terms/magnetic.jl).

Also pins the 'Magnetic' energy bookkeeping: sum of the two pieces plus
kinetic and potential must reproduce the total.
"""
import numpy as np
import pytest

import dftk_tpu as dftk

A_CELL = 14.0
W0 = 1.0
B = 0.4


def _basis(Ecut=24.0):
    lattice = np.diag([A_CELL, A_CELL, 0.0])
    c = A_CELL / 2

    def pot(r):
        x, y = r[..., 0] - c, r[..., 1] - c
        # harmonic trap + the diamagnetic |A|^2/2
        return (W0 ** 2 / 2 + B ** 2 / 8) * (x ** 2 + y ** 2)

    def Apot(r):
        x, y = r[..., 0] - c, r[..., 1] - c
        return np.stack([-B / 2 * y, B / 2 * x, np.zeros_like(x)], axis=-1)

    m = dftk.Model(lattice, [], [], n_electrons=2,
                   spin_polarization="spinless",
                   term_types=[dftk.Kinetic(), dftk.ExternalFromReal(pot),
                               dftk.Magnetic(Apot=Apot)],
                   symmetries=False)
    return dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=(1, 1, 1))


def test_fock_darwin_spectrum():
    b = _basis()
    res = dftk.self_consistent_field(b, tol=1e-10, n_bands=6, maxiter=10)
    Om = np.sqrt(W0 ** 2 + B ** 2 / 4)
    exact = np.sort([Om,                      # (0, 0)
                     2 * Om - B / 2,          # (0, -1)
                     2 * Om + B / 2,          # (0, +1)
                     3 * Om - B,              # (0, -2)
                     3 * Om,                  # (1, 0)
                     3 * Om + B])             # (0, +2)
    ev = np.sort(np.asarray(res.eigenvalues)[0, :6])
    assert np.abs(ev - exact).max() < 2e-4

    # energy bookkeeping: the Magnetic cross term appears in the breakdown
    # and the total assembles from the pieces.  Two spinless electrons fill
    # the two lowest Fock-Darwin levels: E = Omega + (2 Omega - B/2)
    assert "Magnetic" in res.energies
    assert abs(res.total_energy - (3 * Om - B / 2)) < 5e-4
    parts = (res.energies["Kinetic"] + res.energies["AtomicLocal"]
             + res.energies["Magnetic"])
    assert abs(parts - res.total_energy) < 1e-10

    # compute_current: H contains +B/2 L_z (A.p with the symmetric gauge),
    # so the occupied excited level is m = -1; the occupied (0,0)+(0,-1)
    # state carries total angular momentum L_z = -1 exactly:
    # L_z = int (x J_y - y J_x) dvol with the paramagnetic current
    from dftk_tpu.postprocess.current import compute_current
    J = compute_current(res)
    n1, n2, _ = b.fft_size
    xs = (np.arange(n1) / n1) * A_CELL - A_CELL / 2
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    dvol = b.dvol
    Lz = float(np.sum((X[:, :, None] * J[1] - Y[:, :, None] * J[0])) * dvol)
    assert abs(Lz - (-1.0)) < 1e-3
