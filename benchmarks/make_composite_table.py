"""Natural-gradient composite table: build + invert + 100 inverse-matvecs.

The per-operator tables answer "how fast is each phase"; the number a
natural-gradient user actually experiences is the composite
``KFAC factor build + damped-inverse build + 100 inverse matvecs`` per
refresh cycle.  This script assembles that composite per problem from the
BANKED per-phase JSONs (``results/synthetic_<problem>.json``) — never from
fresh timings — choosing the best measured inversion recipe per problem
(heuristic Cholesky / exact eigh / randomized rank-r), and compares it to
the same composite assembled from the reference's published numbers
(``/root/reference/docs/examples/basic_usage/benchmark/`` via BASELINE.md:
compiled column; factors = the faster ``fx`` backend, inverse build = its
"KFAC Cholesky inverse" phase, matvec = "KFAC-inverse (hooks) matvec").

Usage::

    python benchmarks/make_composite_table.py          # print
    python benchmarks/make_composite_table.py --write  # rewrite RESULTS.md block
"""

from __future__ import annotations

import json
from pathlib import Path

RESULTS_DIR = Path(__file__).parent / "results"

# reference composite inputs, ms, torch.compile'd (BASELINE.md tables;
# per-file source /root/reference/docs/examples/basic_usage/benchmark/)
REFERENCE_MS = {
    # problem: (KFAC factors (fx), KFAC Cholesky inverse, inverse matvec)
    "mnist_mlp": (2.46, 6.94, 0.54),
    "cifar10_resnet18": (22.7, 104.7, 4.65),
    "imagenet_resnet50": (222.9, 182.5, 8.59),
    "shakespeare_nanogpt": (283.8, 346.2, 31.6),
}

PROBLEM_ORDER = [
    "mnist_mlp",
    "cifar10_resnet18",
    "imagenet_resnet50",
    "cifar10_vit",
    "shakespeare_nanogpt",
]

N_MATVECS = 100


def _get(results: dict, key: str):
    v = results.get(key)
    return v if isinstance(v, (int, float)) else None


def _recipes(results: dict):
    """Yield (label, inverse build s, inverse matvec ms) for banked recipes."""
    out = []
    b = _get(results, "KFAC heuristic inverse build (s)")
    m = _get(results, "KFAC heuristic inverse matvec (ms)")
    if b is not None and m is not None:
        out.append(("heuristic (Cholesky)", b, m))
    b = _get(results, "KFAC exact-damped inverse build (s)")
    m = _get(results, "KFAC inverse matvec (ms)")
    if b is not None and m is not None:
        out.append(("exact eigh", b, m))
    # NOTE rank-r randomized inversion is deliberately NOT a candidate:
    # it is preconditioner-grade (real-factor damped-inverse rel err ~0.35
    # at damping 1e-3 — RESULTS.md "Real-factor rank-r quality"), a
    # different quality class than the reference's Cholesky inverse, so
    # letting it win the "best recipe" slot would make the speedup column
    # an apples-to-oranges comparison.  Both candidates above match the
    # reference's own recipes: heuristic == its "KFAC Cholesky inverse"
    # (damp factors, Cholesky), exact eigh == its use_exact_damping=True.
    return out


def compose(problem: str, dtype_suffix: str = "") -> dict | None:
    f = RESULTS_DIR / f"synthetic_{problem}{dtype_suffix}.json"
    if not f.exists():
        return None
    results = json.loads(f.read_text())
    factors = _get(results, "KFAC factors (s)")
    if factors is None:
        return None
    best = None
    for label, build_s, matvec_ms in _recipes(results):
        total = factors + build_s + N_MATVECS * matvec_ms / 1e3
        if best is None or total < best["total_s"]:
            best = {
                "recipe": label,
                "factors_s": factors,
                "inverse_build_s": build_s,
                "matvec_ms": matvec_ms,
                "total_s": total,
            }
    return best


def render_table() -> str:
    rows = [
        "| problem | recipe | factors (s) | inverse build (s) "
        "| 100 inv-matvecs (s) | composite (s) | reference (s, compiled) "
        "| speedup |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for problem in PROBLEM_ORDER:
        best = compose(problem)
        if best is None:
            continue
        ref = REFERENCE_MS.get(problem)
        ref_s = (
            (ref[0] + ref[1] + N_MATVECS * ref[2]) / 1e3 if ref else None
        )
        speedup = (
            f"**{ref_s / best['total_s']:.1f}x**" if ref_s else "—"
        )
        rows.append(
            f"| {problem} | {best['recipe']} | {best['factors_s']:.3g} "
            f"| {best['inverse_build_s']:.3g} "
            f"| {N_MATVECS * best['matvec_ms'] / 1e3:.3g} "
            f"| **{best['total_s']:.3g}** "
            f"| {f'{ref_s:.3g}' if ref_s else '—'} | {speedup} |"
        )
    return "\n".join(rows)


def write_results_md() -> bool:
    md = Path(__file__).parent / "RESULTS.md"
    text = md.read_text()
    begin, end = "<!-- composite-table:begin -->", "<!-- composite-table:end -->"
    i, j = text.index(begin), text.index(end)
    new = text[: i + len(begin)] + "\n" + render_table() + "\n" + text[j:]
    if new != text:
        md.write_text(new)
        return True
    return False


if __name__ == "__main__":
    import sys

    if "--write" in sys.argv:
        print("updated" if write_results_md() else "unchanged")
    else:
        print(render_table())
