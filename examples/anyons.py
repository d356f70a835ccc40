"""Almost-bosonic anyons in a 2D harmonic trap (reference examples/anyons.jl;
arXiv:1901.10739): electrons coupled to a density-dependent Chern-Simons
gauge field.  The zero third lattice vector declares a 2D system; the
Hamiltonian is obtained by autodiff through the gauge field, so direct
minimization needs no hand-derived current-response operator.

The ground state carries angular momentum -- seed the minimizer in the
winding sector (a plain real start relaxes to a higher J=0 stationary
point), then report the scale-invariant ratio e(1,1)/(2 pi) ~ 1.2 the
paper quotes as 1.18."""
import math

import jax
import jax.numpy as jnp
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.ops import fft as fftops

a = 14.0
lattice = np.diag([a, a, 0.0])
pot = lambda r: (r[..., 0] - a / 2) ** 2 + (r[..., 1] - a / 2) ** 2
beta = 5.0

model = dftk.Model(lattice, [], [], n_electrons=1,
                   spin_polarization="spinless",
                   term_types=[dftk.Kinetic(scaling_factor=2.0),
                               dftk.ExternalFromReal(pot),
                               dftk.Anyonic(hbar=1.0, beta=beta)],
                   symmetries=False)
basis = dftk.PlaneWaveBasis(model, Ecut=20.0, kgrid=(1, 1, 1))

# winding -1 Gaussian vortex seed
n1, n2, n3 = basis.fft_size
xs = (np.arange(n1) / n1 - 0.5) * a
X, Y = np.meshgrid(xs, xs, indexing="ij")
psi_r = ((X - 1j * Y) * np.exp(-(X ** 2 + Y ** 2) / 2))[:, :, None]
cube = jnp.asarray(np.fft.fftn(psi_r)
                   / (n1 * n2 * n3 / math.sqrt(model.unit_cell_volume)))[None]
psi0 = jax.vmap(fftops.gather_from_cube)(cube, basis.data.Gidx,
                                         basis.data.mask)[:, None, :]
psi0 = psi0 / jnp.linalg.norm(psi0)

res = dftk.direct_minimization(basis, tol=1e-9, maxiter=4000, psi=psi0)
E = res.total_energy
s = 2
e11 = (math.pi / 2 * (2 * (s + 1) / s) ** ((s + 2) / s)
       * (s / (s + 2)) ** (2 * (s + 1) / s) * E ** ((s + 2) / s) / beta)
print("anyon energies:", {k: round(v, 6) for k, v in res.energies.items()})
print(f"E = {E:.6f},  e(1,1)/(2 pi) = {e11 / (2 * math.pi):.4f}  (paper: 1.18)")
