"""RESULTS.md's speedup tables must match what ``make_stats_table.py``
regenerates from the banked result JSONs (the round-4 provenance rule: no
published cell without a banked JSON from the current harness).  After
re-running ``benchmarks/run.py`` on any problem, refresh the tables with
``python benchmarks/make_stats_table.py`` and paste the regenerated rows.
"""

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _regenerated_table_rows() -> list[str]:
    sys.path.insert(0, str(REPO / "benchmarks"))
    try:
        import make_stats_table
    finally:
        sys.path.pop(0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        make_stats_table.speedup_tables()
    return [
        line
        for line in buf.getvalue().splitlines()
        # data rows only: skip headers/separators, which repeat across tables
        if line.startswith("| ") and not line.startswith("| operator")
        and not line.startswith("| phase")
    ]


def test_results_md_speedup_tables_match_banked_jsons():
    page = (REPO / "benchmarks" / "RESULTS.md").read_text()
    rows = _regenerated_table_rows()
    assert len(rows) >= 10, "renderer produced suspiciously few rows"
    stale = [r for r in rows if r not in page]
    assert not stale, (
        "RESULTS.md speedup tables are stale vs the banked JSONs — "
        "regenerate with `python benchmarks/make_stats_table.py` and paste "
        f"the updated rows. Mismatched rows:\n" + "\n".join(stale)
    )


def test_results_md_boundary_table_matches_banked_json():
    sys.path.insert(0, str(REPO / "benchmarks"))
    try:
        import make_boundary_table
    finally:
        sys.path.pop(0)
    page = (REPO / "benchmarks" / "RESULTS.md").read_text()
    begin = "<!-- boundary-table:begin -->"
    end = "<!-- boundary-table:end -->"
    block = page[page.index(begin) + len(begin): page.index(end)].strip()
    expected = make_boundary_table.render_table().strip()
    assert block == expected, (
        "RESULTS.md HBM-boundary table is stale vs results/hbm_boundary.json"
        " — refresh with `python benchmarks/make_boundary_table.py --write`."
    )


def test_results_md_composite_table_matches_banked_jsons():
    sys.path.insert(0, str(REPO / "benchmarks"))
    try:
        import make_composite_table
    finally:
        sys.path.pop(0)
    page = (REPO / "benchmarks" / "RESULTS.md").read_text()
    begin = "<!-- composite-table:begin -->"
    end = "<!-- composite-table:end -->"
    block = page[page.index(begin) + len(begin): page.index(end)].strip()
    expected = make_composite_table.render_table().strip()
    assert block == expected, (
        "RESULTS.md natural-gradient composite table is stale vs the banked"
        " per-problem JSONs — refresh with "
        "`python benchmarks/make_composite_table.py --write`."
    )


def test_results_md_bf16_table_matches_banked_jsons():
    sys.path.insert(0, str(REPO / "benchmarks"))
    try:
        import make_stats_table
    finally:
        sys.path.pop(0)
    page = (REPO / "benchmarks" / "RESULTS.md").read_text()
    begin = "<!-- bf16-table:begin -->"
    end = "<!-- bf16-table:end -->"
    block = page[page.index(begin) + len(begin): page.index(end)].strip()
    expected = make_stats_table.bf16_table().strip()
    assert block == expected, (
        "RESULTS.md bfloat16 table is stale vs the banked *_bfloat16.json "
        "files — refresh with `python -c \"import sys; "
        "sys.path.insert(0,'benchmarks'); import make_stats_table; "
        "make_stats_table.write_bf16_block()\"`."
    )
