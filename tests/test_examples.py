"""Execute the cheapest examples end-to-end (the reference runs its whole
examples/ directory in CI, test/examples.jl) — catches example rot."""
import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.mark.slow
def test_gross_pitaevskii_example(capsys):
    runpy.run_path(str(EXAMPLES / "gross_pitaevskii.py"), run_name="__main__")
    assert "GPE energies" in capsys.readouterr().out


@pytest.mark.slow
def test_anyons_example(capsys):
    runpy.run_path(str(EXAMPLES / "anyons.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "e(1,1)" in out
