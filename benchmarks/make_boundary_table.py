"""Render the measured HBM-boundary table from ``results/hbm_boundary.json``.

Counterpart of the reference's runtime peak-memory table
(``/root/reference/docs/examples/basic_usage/example_benchmark.py:74-79``):
the tunnel exposes no runtime memory stats, so instead of a GiB column the
boundary is reported directly — the largest power-of-two batch whose
operator matvec (GGN) or factor build + matvec (KFAC/EKFAC) actually runs
on one chip, with XLA's own OOM ledger banked on the first failing batch
(probes by ``hbm_boundary.py``; ladder by ``hbm_boundary_ladder.py``).

A cell is *bracketed* when both the largest fitting B and a failing 2B are
measured; until then it prints ``>= B`` (a lower bound, never a guess).

Usage::

    python benchmarks/make_boundary_table.py
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

RESULTS = Path(__file__).parent / "results" / "hbm_boundary.json"

PROBLEM_ORDER = [
    "mnist_mlp",
    "cifar10_resnet18",
    "imagenet_resnet50",
    "cifar10_vit",
    "shakespeare_nanogpt",
]
OP_ORDER = ["ggn", "kfac", "ekfac"]
DTYPES = ["float32", "bfloat16"]


def load_cells() -> dict[tuple[str, str, str], dict[int, dict]]:
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    cells: dict[tuple[str, str, str], dict[int, dict]] = defaultdict(dict)
    for key, entry in data.items():
        problem, op, dtype, b = key.split("/")
        cells[(problem, op, dtype)][int(b[len("B="):])] = entry
    return cells


def render_cell(probes: dict[int, dict]) -> str:
    if not probes:
        return "—"
    fits = sorted(b for b, e in probes.items() if e["fits"])
    ooms = sorted(b for b, e in probes.items() if not e["fits"])
    if fits and ooms and min(ooms) <= max(fits):
        # A banked OOM at a batch that also (or at a smaller batch than one
        # that) fit is contradictory — likely a flaky-tunnel failure. Never
        # publish a boundary above a measured failure; demand a re-probe.
        return f"CONFLICT (fit {max(fits)} but OOM {min(ooms)}; re-probe)"
    if fits and ooms and min(ooms) <= 2 * max(fits):
        return f"**{max(fits)}** (OOM at {min(ooms)})"
    if fits:
        return f">= {max(fits)} (unbracketed)"
    return f"< {min(ooms)} (OOM; no fitting probe yet)"


def render_table() -> str:
    cells = load_cells()
    out: list[str] = []
    probed_ops = [
        op for op in OP_ORDER
        if any(k[1] == op for k in cells)
    ]
    out.append(
        "| problem | "
        + " | ".join(f"{op} {dt}" for op in probed_ops for dt in DTYPES
                     if any(k[1] == op and k[2] == dt for k in cells))
        + " |"
    )
    columns = [
        (op, dt) for op in probed_ops for dt in DTYPES
        if any(k[1] == op and k[2] == dt for k in cells)
    ]
    out.append("|" + "---|" * (len(columns) + 1))
    for problem in PROBLEM_ORDER:
        if not any(k[0] == problem for k in cells):
            continue
        row = [render_cell(cells.get((problem, op, dt), {}))
               for op, dt in columns]
        out.append(f"| {problem} | " + " | ".join(row) + " |")

    return "\n".join(out)


def write_results_md() -> bool:
    """Replace the marker-delimited table block in RESULTS.md; True if changed."""
    md = Path(__file__).parent / "RESULTS.md"
    text = md.read_text()
    begin, end = "<!-- boundary-table:begin -->", "<!-- boundary-table:end -->"
    i, j = text.index(begin), text.index(end)
    new = text[: i + len(begin)] + "\n" + render_table() + "\n" + text[j:]
    if new != text:
        md.write_text(new)
        return True
    return False


def main() -> None:
    print(render_table())

    # OOM-ledger excerpts: the first failing batch per cell, so the table's
    # verdicts stay auditable without opening the JSON.
    for (problem, op, dtype), probes in sorted(load_cells().items()):
        ooms = sorted(b for b, e in probes.items() if not e["fits"])
        if not ooms:
            continue
        head = probes[ooms[0]].get("oom_ledger_head", "")
        first_line = next(
            (ln for ln in head.splitlines() if ln.strip()), ""
        )
        print(f"\n{problem}/{op}/{dtype} B={ooms[0]}: {first_line[:160]}")


if __name__ == "__main__":
    import sys as _sys

    if "--write" in _sys.argv:
        print("updated" if write_results_md() else "unchanged")
    else:
        main()
