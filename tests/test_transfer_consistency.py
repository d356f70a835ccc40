"""Blochwave transfer round-trips + total energy from orbital eigenvalues.

Mirrors reference test/transfer.jl and test/energy_orbital_eigenvalues.jl.
"""
import jax
import jax.numpy as jnp
import numpy as np

import dftk_tpu as dftk
from testcases import silicon


def _scf(Ecut=5.0, tol=1e-9):
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                       functionals="LDA")
    kgrid = dftk.MonkhorstPack((2, 2, 2), kshift=(0.5, 0.5, 0.5))
    b = dftk.PlaneWaveBasis(m, Ecut=Ecut, kgrid=kgrid)
    return dftk.self_consistent_field(b, tol=tol), b, m, kgrid


def test_transfer_blochwave_roundtrip():
    from dftk_tpu.transfer import transfer_blochwave
    res, b, m, kgrid = _scf()
    psi = np.asarray(res.psi)
    b_big = dftk.PlaneWaveBasis(m, Ecut=b.Ecut + 5, kgrid=kgrid)
    psi_b = transfer_blochwave(psi, b, b_big)
    psi_bb = transfer_blochwave(psi_b, b_big, b)
    # up-transfer is an isometry onto the bigger sphere; the round trip is
    # the identity (reference transfer.jl:20-25)
    assert np.abs(psi_bb - psi).max() < 1e-14
    for ik in range(psi_b.shape[0]):
        G = np.asarray(psi_b[ik]) @ np.asarray(psi_b[ik]).conj().T
        assert np.abs(G - np.eye(G.shape[0])).max() < 1e-12


def test_energy_from_orbital_eigenvalues():
    """E_tot = sum w f eps - E_Hartree + (E_xc - int rho Vxc) + static terms
    (reference energy_orbital_eigenvalues.jl): eigenvalues double-count the
    Hartree term and contain int rho Vxc instead of E_xc."""
    from dftk_tpu.ops import hamiltonian as hamops
    res, b, m, kgrid = _scf(tol=1e-11)
    w = np.asarray(b.kweights)[:, None]
    occ = np.asarray(res.occupation)
    ev = np.asarray(res.eigenvalues)[:, :occ.shape[1]]
    sum_eig = float(np.sum(w * occ * ev))

    rho = jnp.asarray(res.rho)
    Gcart = jnp.asarray(b.G_cube_cart)
    vol = m.unit_cell_volume
    dvol = vol / np.prod(b.fft_size)
    exc, Vxc = jax.value_and_grad(
        lambda r: hamops.xc_energy(b.terms.xc, r, Gcart, vol,
                                   b.terms.xc_scaling))(rho)
    int_rho_vxc = float(jnp.sum(Vxc / dvol * rho) * dvol)
    E_H = float(res.energies["Hartree"])
    E = (sum_eig - E_H + float(exc) - int_rho_vxc
         + b.terms.E_ewald + b.terms.E_psp_correction)
    assert abs(E - res.total_energy) < 1e-8


def test_transfer_density_roundtrip():
    """Spectral density transfer to a finer grid and back is the identity;
    the integral is preserved either way (reference interpolation.jl)."""
    from dftk_tpu.ops.density import guess_density
    from dftk_tpu.transfer import transfer_density
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                       functionals="LDA")
    b1 = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(1, 1, 1),
                             fft_size=(16,) * 3)
    b2 = dftk.PlaneWaveBasis(m, Ecut=5.0, kgrid=(1, 1, 1),
                             fft_size=(24,) * 3)
    rho = np.asarray(guess_density(b1))
    up = np.asarray(transfer_density(jnp.asarray(rho), b1, b2))
    back = np.asarray(transfer_density(jnp.asarray(up), b2, b1))
    assert np.abs(back - rho).max() < 1e-12
    assert abs(up.sum() * b2.dvol - rho.sum() * b1.dvol) < 1e-12
