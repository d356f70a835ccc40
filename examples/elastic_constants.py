"""Clamped-ion elastic constants of silicon: two independent routes.

Mirrors the reference's elastic-constants workflow: (a) finite
differences of the stress under strain (postprocess/elastic.py) and (b)
the density-functional perturbation route solving one Sternheimer system
per strain (postprocess/elastic_response.py).  Both give the clamped-ion
C11 (ion relaxation would lower C11/C44 further).
"""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.postprocess.elastic import elastic_tensor

A0 = 5.131570667152971
LATTICE0 = np.array([[0, A0, A0], [A0, 0, A0], [A0, A0, 0.0]])


def make_basis(lattice):
    Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
    model = dftk.model_DFT(lattice, [Si, Si],
                           [np.ones(3) / 8, -np.ones(3) / 8],
                           functionals=["lda_x", "lda_c_vwn"])
    return dftk.PlaneWaveBasis(model, Ecut=7.0, kgrid=(2, 2, 2),
                               fft_size=(18, 18, 18))


def main():
    # (a) finite-difference route, C11 component only (cheap demo)
    C_fd = elastic_tensor(make_basis, LATTICE0,
                          scf_kwargs=dict(tol=1e-9), components=[0])
    C11_fd = float(C_fd[0, 0])

    # (b) response (DFPT) route from one converged SCF
    scfres = dftk.self_consistent_field(make_basis(LATTICE0), tol=1e-10)
    C_resp = dftk.elastic_tensor_response(scfres)
    C11_resp = float(np.asarray(C_resp)[0, 0])

    GPa = 29421.02648438959  # Ha/bohr^3 -> GPa
    print(f"C11 (clamped ion)  FD route:   {C11_fd * GPa:8.1f} GPa")
    print(f"C11 (clamped ion)  DFPT route: {C11_resp * GPa:8.1f} GPa")
    print(f"routes agree to {abs(C11_fd - C11_resp) * GPa:.2f} GPa")
    assert abs(C11_fd - C11_resp) * GPa < 5.0
    return C11_fd, C11_resp


if __name__ == "__main__":
    main()
