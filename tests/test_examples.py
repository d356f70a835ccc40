"""Execute examples end-to-end (the reference runs its whole examples/
directory in CI, test/examples.jl) — catches example rot.

Each entry = (script, output marker that only appears when the physics
part actually ran to completion).  Everything here finishes in minutes on
this container's CPU; the genuinely heavy scripts (phonons, SCAN/HSE
silicon, collinear iron, TB09) are exercised by their dedicated physics
tests instead (test_phonon*, test_mgga*, test_exx*, test_tb09,
test_metals_spin).
"""
import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"

CASES = [
    ("gross_pitaevskii.py", "GPE energies"),
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
]


@pytest.mark.slow
@pytest.mark.parametrize("script,marker",
                         CASES, ids=[c[0][:-3] for c in CASES])
def test_example(script, marker, capsys):
    runpy.run_path(str(EXAMPLES / script), run_name="__main__")
    assert marker in capsys.readouterr().out
