"""The worked examples must keep running (doc-parity protection)."""

import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"


@pytest.mark.parametrize(
    "script",
    [
        "01_matrix_vector_products.py",
        "02_eigenvalues_and_spectrum.py",
        "03_natural_gradient_with_kfac.py",
        "04_huggingface_interop.py",
        "05_submatrices_and_estimation.py",
        "06_model_merging.py",
        "07_visual_tour.py",
        "08_monte_carlo_fisher.py",
        "09_mesh_scaleout.py",
        "10_influence_functions.py",
    ],
)
def test_example_runs(script, capsys, tmp_path, monkeypatch):
    # figures render to a temp dir so the suite never dirties committed assets
    monkeypatch.setenv("VISUAL_TOUR_OUT", str(tmp_path))
    runpy.run_path(str(EXAMPLES / script), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script} produced no output"
