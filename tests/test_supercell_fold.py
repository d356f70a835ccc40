"""cell_to_supercell: folding a k-grid SCF into the Gamma supercell."""
import numpy as np

import dftk_tpu as dftk
from dftk_tpu.supercell import cell_to_supercell, create_supercell

from testcases import make_silicon_model


def test_fold_preserves_momenta_and_norms():
    m = make_silicon_model()
    b = dftk.PlaneWaveBasis(m, Ecut=7.0, kgrid=(2, 2, 2),
                            use_symmetries_for_kpoint_reduction=False)
    res = dftk.self_consistent_field(b, tol=1e-8)
    sc, folded = cell_to_supercell(res)

    assert sc["size"] == (2, 2, 2)
    B_sc = 2 * np.pi * np.linalg.inv(np.asarray(sc["lattice"])).T
    for ik, entry in enumerate(folded):
        G_sc = entry["G"]
        # physical momentum match: B_sc G_sc == B (k + G)
        k = b.kcoords_spin[ik]
        nG = G_sc.shape[0]
        p_sc = G_sc @ B_sc.T
        p_uc = (b.Gred_np[ik, :nG] + k) @ m.recip_lattice.T
        np.testing.assert_allclose(p_sc, p_uc, atol=1e-10)
        # kinetic energies per band match the unit-cell values
        c = entry["coeffs"]
        kin_sc = 0.5 * np.einsum("ng,g->n", np.abs(c) ** 2,
                                 np.einsum("ga,ga->g", p_sc, p_sc))
        kin_uc = 0.5 * np.einsum("ng,g->n", np.abs(c) ** 2,
                                 np.einsum("ga,ga->g", p_uc, p_uc))
        np.testing.assert_allclose(kin_sc, kin_uc, rtol=1e-12)
        # orbitals stay normalized
        np.testing.assert_allclose(np.sum(np.abs(c) ** 2, axis=1), 1.0,
                                   atol=1e-8)

    # total electron count carried by the folded orbitals
    occ = np.asarray(res.occupation)
    n_elec = sum(b.kweights[ik]
                 * (occ[ik] @ np.sum(np.abs(f["coeffs"]) ** 2, axis=1))
                 for ik, f in enumerate(folded))
    np.testing.assert_allclose(n_elec, m.n_electrons, atol=1e-6)
