"""docs/API.md must cover the full public API (regenerate with
``python tools/gen_api_docs.py`` after changing exports or docstrings)."""

from pathlib import Path

import curvlinops_tpu as cl

REPO = Path(__file__).resolve().parent.parent


def test_api_docs_cover_public_api():
    page = (REPO / "docs" / "API.md").read_text()
    missing = [n for n in cl.__all__ if f"`{n}" not in page]
    assert not missing, (
        f"docs/API.md is stale — missing {missing}; "
        "regenerate with `python tools/gen_api_docs.py`"
    )


def test_api_docs_generator_groups_everything():
    import subprocess
    import sys

    # the generator exits non-zero when a public symbol is ungrouped
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_api_docs.py")],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr or res.stdout
