"""Band gaps with the TB09 (modified Becke-Johnson) potential.

TB09 is a potential-ONLY meta-GGA (PRL 102, 226401): famously accurate band
gaps at LDA cost, but no energy functional -- converge on the density and
use the eigenvalues (total energies are not variational; forces/stresses
are undefined and guarded).  Reference exposure: :mgga_x_tb09 through
libxc (src/DispatchFunctional.jl)."""
import numpy as np

import dftk_tpu as dftk

a = 5.131570667152971
lattice = np.array([[0.0, a, a], [a, 0.0, a], [a, a, 0.0]])
Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
positions = [np.ones(3) / 8, -np.ones(3) / 8]

HARTREE_EV = 27.211386245988


def gap(functionals):
    m = dftk.model_DFT(lattice, [Si, Si], positions, functionals=functionals)
    b = dftk.PlaneWaveBasis(m, Ecut=14.0, kgrid=(4, 4, 4))
    r = dftk.self_consistent_field(b, tol=1e-8, n_bands=8,
                                   is_converged="density")
    ev = np.asarray(r.eigenvalues)
    return (ev[:, 4].min() - ev[:, 3].max()) * HARTREE_EV


print(f"Si gap  LDA : {gap('LDA'):.3f} eV")          # ~0.6  (underestimated)
print(f"Si gap  TB09: {gap('TB09'):.3f} eV")         # ~1.3  (expt 1.17)
