"""Execute examples end-to-end (the reference runs its whole examples/
directory in CI, test/examples.jl) — catches example rot.

Each entry = (script, output marker that only appears when the physics
part actually ran to completion).  All carry the `examples` marker (the
reference's "example" CI payload analogue; run with `pytest -m examples`)
and `slow` (excluded from the minimal tier).  The genuinely heavy scripts
(phonons, SCAN/HSE silicon, collinear iron, TB09, elastic constants,
convergence studies, Hubbard U-scan) are exercised by their dedicated
physics tests instead (test_phonon*, test_mgga*, test_exx*, test_tb09,
test_metals_spin, test_elastic_resp, test_hamiltonian_consistency).
"""
import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"

CASES = [
    ("gross_pitaevskii.py", "GPE energies"),
    ("gross_pitaevskii_2D.py", "max in-plane current"),
    ("anyons.py", "e(1,1)"),
    ("custom_potential.py", "forces (reduced):"),
    ("custom_solvers.py", "custom criterion:"),
    ("compare_solvers.py", "E_newton"),
    ("supercells.py", "SimpleMixing iters:"),
    ("graphene.py", "separation at K"),
    ("energy_cutoff_smearing.py", "estimated a0"),
    ("error_estimates_forces.py", "practical error estimate"),
    ("silicon_lda.py", "indirect gap"),
    ("metallic_aluminium.py", "fractional occupations present:"),
    ("polarizability.py", "alpha(He, LDA)"),
    ("hybrid_he.py", "E ="),
    ("band_structure_dos.py", "DOS at Fermi level"),
    ("arbitrary_floattype.py", "|dE|"),
    ("cohen_bergstresser.py", "CB silicon direct gap"),
    ("density_methods.py", "spin guess: total magnetization"),
    ("scf_callbacks.py", "checkpoint restart:"),
    ("analysing_scf_convergence.py", "largest dielectric eigenvalue"),
    ("forwarddiff.py", "dE/d(dilation)"),
    ("exact_exchange.py", "k-point exchange folding error"),
    ("pseudopotentials.py", "families differ by"),
    ("geometry_optimization.py", "step"),
]


@pytest.mark.examples
@pytest.mark.slow
@pytest.mark.parametrize("script,marker",
                         CASES, ids=[c[0][:-3] for c in CASES])
def test_example(script, marker, capsys):
    runpy.run_path(str(EXAMPLES / script), run_name="__main__")
    assert marker in capsys.readouterr().out
