"""Collinear spin: ferromagnetic bcc iron."""
import numpy as np
import jax.numpy as jnp
import dftk_tpu as dftk

lattice = 2.71176 * np.array([[-1, 1, 1], [1, -1, 1], [1, 1, -1]], float)
Fe = dftk.ElementPsp.from_symbol("Fe")
model = dftk.model_DFT(lattice, [Fe], [np.zeros(3)],
                       functionals=["lda_xc_teter93"], temperature=0.01,
                       magnetic_moments=[4.0],
                       smearing=dftk.Smearing.FermiDirac())
basis = dftk.PlaneWaveBasis(model, Ecut=15.0,
                            kgrid=dftk.MonkhorstPack((4, 4, 4),
                                                     (0.5, 0.5, 0.5)))
rho0 = dftk.guess_density(basis, magnetic_moments=[4.0])
scfres = dftk.self_consistent_field(basis, tol=1e-7, rho=rho0)
magn = float(jnp.sum(scfres.rho[0] - scfres.rho[1]) * basis.dvol)
print("E =", scfres.total_energy, " magnetization:", magn, "mu_B")
