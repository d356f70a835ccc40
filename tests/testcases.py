"""Shared test fixtures: pinned small systems with golden reference values.

Mirrors the reference's fixture style (DFTK test/testcases.jl): canonical
lattices, pseudopotentials and explicit k-grids, plus eigenvalue/energy
references cross-checked against ABINIT (values quoted in the reference's
test suite, test/silicon_lda.jl:10-20).
"""
import numpy as np

import dftk_tpu as dftk

_A_SI = 5.131570667152971

silicon = dict(
    lattice=np.array([[0.0, _A_SI, _A_SI],
                      [_A_SI, 0.0, _A_SI],
                      [_A_SI, _A_SI, 0.0]]),
    atnum=14,
    n_electrons=8,
    temperature=0.0,
    psp="lda/si-q4",
    positions=[np.ones(3) / 8, -np.ones(3) / 8],
    kgrid=dftk.ExplicitKpoints(
        [[0, 0, 0], [1 / 3, 0, 0], [1 / 3, 1 / 3, 0], [-1 / 3, 1 / 3, 0]],
        [1 / 27, 8 / 27, 6 / 27, 12 / 27]),
)

# ABINIT reference (Ecut=25) for silicon LDA (lda_x + lda_c_vwn)
silicon_lda_ref_evals = [
    [-0.178566465714968, 0.261882541175914, 0.261882541178847, 0.261882541181782,
     0.354070367072414, 0.354070367076363, 0.354070367080310, 0.376871160884678],
    [-0.127794342370963, 0.064395861472044, 0.224958824747686, 0.224958824750934,
     0.321313617512188, 0.388442495007398, 0.388442495010722, 0.542078732298094],
    [-0.108449612789883, 0.077125812982728, 0.172380374761464, 0.172380374766260,
     0.283802499666810, 0.329872296009131, 0.525606867582028, 0.525606867585921],
    [-0.058089253154566, 0.012364292440522, 0.097350168867990, 0.183765652148129,
     0.314593174568090, 0.470869435132365, 0.496966579772700, 0.517009645871194],
]
silicon_lda_ref_etot = -7.911817522631488

magnesium = dict(
    lattice=np.array([[-3.0179389206, -3.0179389206, 0.0],
                      [-5.2272235447, 5.2272235447, 0.0],
                      [0.0, 0.0, -9.7736219469]]).T,  # columns = vectors
    atnum=12,
    n_electrons=4,
    psp="lda/mg-q2",
    positions=[np.array([2 / 3, 1 / 3, 1 / 4]), np.array([1 / 3, 2 / 3, 3 / 4])],
    kgrid=dftk.ExplicitKpoints(
        [[0, 0, 0], [1 / 3, 0, 0], [1 / 3, 1 / 3, 0],
         [0, 0, 1 / 3], [1 / 3, 0, 1 / 3], [1 / 3, 1 / 3, 1 / 3]],
        [1 / 27, 6 / 27, 2 / 27, 2 / 27, 12 / 27, 4 / 27]),
    temperature=0.01,
)

aluminium = dict(
    lattice=np.diag([4 * 7.6324708938577865, 7.6324708938577865,
                     7.6324708938577865]),
    atnum=13,
    n_electrons=12,
    psp="lda/al-q3",
    positions=[np.array([0, 0, 0]), np.array([0, 1 / 2, 1 / 2]),
               np.array([1 / 8, 0, 1 / 2]), np.array([1 / 8, 1 / 2, 0])],
    temperature=0.0009500431544769484,
)

iron_bcc = dict(
    lattice=2.71176 * np.array([[-1, 1, 1], [1, -1, 1], [1, 1, -1]], dtype=float),
    atnum=26,
    n_electrons=8,
    psp="lda/fe-q8",
    positions=[np.zeros(3)],
    temperature=0.01,
)


def make_silicon_model(functionals=("lda_x", "lda_c_vwn"), **kwargs):
    Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
    return dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                          functionals=functionals, **kwargs)
