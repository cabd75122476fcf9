"""Render the per-problem MFU / FLOPs / peak-memory ledger from result JSONs.

The reference publishes peak memory for every operator × problem
(``docs/examples/basic_usage/example_benchmark.py``, measured in isolated
subprocesses); the tunnel backend exposes no runtime memory stats, so this
repo's ledger is XLA's compile-time ``memory_analysis`` (argument + temp
buffer sizes of the exact executed program — what the chip must reserve)
plus ``cost_analysis`` FLOPs, collected by ``run.py`` next to every timing
row. This script turns those columns into the markdown tables pasted into
``RESULTS.md``.

Usage::

    python benchmarks/make_stats_table.py            # all problems found
"""

from __future__ import annotations

import json
from pathlib import Path

PROBLEMS = [
    ("synthetic_mnist_mlp", "mnist_mlp"),
    ("synthetic_cifar10_resnet18", "cifar10_resnet18"),
    ("synthetic_imagenet_resnet50", "imagenet_resnet50"),
    ("synthetic_shakespeare_nanogpt", "shakespeare_nanogpt"),
]

ROWS = [
    "forward",
    "gradient+loss",
    "Hessian matvec",
    "GGN matvec",
    "MC-Fisher matvec",
    "Empirical Fisher matvec",
    "KFAC factors",
]


def _load(name: str, dtype: str) -> dict:
    suffix = "" if dtype == "float32" else f"_{dtype}"
    path = Path(__file__).parent / "results" / f"{name}{suffix}.json"
    return json.loads(path.read_text()) if path.exists() else {}


def _cell(data: dict, row: str) -> str:
    key_ms = f"{row} (ms)" if row != "KFAC factors" else "KFAC factors (s)"
    ms = data.get(key_ms)
    if ms is None:
        return "—"
    if isinstance(ms, str):  # "below timing floor (loop-unresolved)" sentinel
        return ms
    if row == "KFAC factors":
        ms = ms * 1e3
    flops = data.get(f"{row} flops (G)")
    mfu = data.get(f"{row} MFU (%)")
    mem = data.get(f"{row} peak temp (GiB)")
    args = data.get(f"{row} args (GiB)")
    parts = [f"{ms:.2f} ms" if ms >= 0.1 else "<0.1 ms"]
    if flops is not None:
        parts.append(f"{flops:.0f} G")
    if isinstance(mfu, (int, float)):
        parts.append(f"{mfu:.0f}%")
    elif ms < 0.1:
        parts.append("n/a")
    if mem is not None and args is not None:
        parts.append(f"{mem + args:.2f} GiB")
    return " / ".join(parts)


# Reference (f-dangel/curvlinops) COMPILED timings on the RTX A6000, ms —
# transcribed from BASELINE.md (which transcribes the reference's published
# benchmark JSONs).  Column order matches PROBLEMS.
_REF_MATVEC_MS = {
    "gradient+loss": (1.70, 10.02, 90.8, 204.7),
    "Hessian matvec": (1.79, 22.5, 252.6, 593.5),
    "GGN matvec": (1.46, 16.0, 197.1, 433.3),
    "MC-Fisher matvec": (3.64, 20.9, 216.2, 493.6),
    "Empirical Fisher matvec": (1.72, 16.8, 196.4, 464.4),
    "KFAC matvec": (0.54, 4.74, 9.04, 37.1),  # fx backend (faster of the two)
    "KFAC inverse matvec": (0.54, 4.65, 8.59, 31.6),
    "EKFAC matvec": (0.91, 9.54, 17.0, 65.7),
}
# Reference compiled precompute, ms: KFAC factors (fx); EKFAC build =
# factors + eigh-of-factors + eigenvalue correction (hooks compiled).
_REF_PRECOMPUTE_MS = {
    "KFAC factors": (2.46, 22.7, 222.9, 283.8),
    "EKFAC build": (69.4, 1300.9, 2517.2, 4317.1),
}


def _speed_cell(ours, ref_ms: float, unit_s: bool = False) -> str:
    if ours is None:
        return "—"
    if isinstance(ours, str):  # below-floor sentinel
        return ours
    ours_ms = ours * 1e3 if unit_s else ours
    if ours_ms <= 0:
        return "below timing floor"
    val = f"{ours:.4g}" if unit_s else f"{ours:.3g}"
    return f"{val} ({ref_ms / ours_ms:.1f}×)"


def speedup_tables() -> None:
    """The RESULTS.md matvec + precompute tables, regenerated from JSONs."""
    datas = [(short, _load(name, "float32")) for name, short in PROBLEMS]
    names = [s for s, _ in datas]
    print("\n### Matrix-vector products (ms; speedup vs compiled reference)\n")
    print("| operator | " + " | ".join(names) + " |")
    print("|" + "---|" * (len(names) + 1))
    for row, refs in _REF_MATVEC_MS.items():
        cells = [
            _speed_cell(d.get(f"{row} (ms)"), r)
            for (_, d), r in zip(datas, refs)
        ]
        print(f"| {row} | " + " | ".join(cells) + " |")
    print("\n### Precompute phases (s; speedup vs compiled reference)\n")
    print("| phase | " + " | ".join(names) + " |")
    print("|" + "---|" * (len(names) + 1))
    for row, refs in _REF_PRECOMPUTE_MS.items():
        cells = [
            _speed_cell(d.get(f"{row} (s)"), r, unit_s=True)
            for (_, d), r in zip(datas, refs)
        ]
        print(f"| {row} | " + " | ".join(cells) + " |")
    row = "KFAC exact-damped inverse build"
    cells = []
    for _, d in datas:
        v = d.get(f"{row} (s)")
        cells.append("—" if v is None else (v if isinstance(v, str) else f"{v:.4g}"))
    print(f"| {row} (no ref counterpart) | " + " | ".join(cells) + " |")


_BF16_PROBLEMS = [
    ("synthetic_cifar10_resnet18", "cifar10_resnet18"),
    ("synthetic_imagenet_resnet50", "imagenet_resnet50"),
    ("synthetic_cifar10_vit", "cifar10_vit"),
    ("synthetic_shakespeare_nanogpt", "shakespeare_nanogpt"),
]
# reference column index (into the 4-wide _REF_* tuples) per bf16 problem;
# the ViT has no reference counterpart
_BF16_REF_COL = {"cifar10_resnet18": 1, "imagenet_resnet50": 2,
                 "shakespeare_nanogpt": 3}

_BF16_ROWS_MS = [
    "gradient+loss", "Hessian matvec", "GGN matvec", "MC-Fisher matvec",
    "Empirical Fisher matvec", "KFAC matvec", "KFAC inverse matvec",
    "EKFAC matvec",
]
_BF16_ROWS_S = ["KFAC factors", "EKFAC build"]
_BF16_ROWS_S_NOREF = [
    "KFAC exact-damped inverse build",
    "KFAC heuristic inverse build",
]


def bf16_table() -> str:
    """The full-operator bf16 table (speedups vs the reference's compiled
    fp32/TF32 A6000 — it publishes no bf16 rows), regenerated from the
    banked ``*_bfloat16.json`` files."""
    datas = [(short, _load(name, "bfloat16")) for name, short in _BF16_PROBLEMS]
    datas = [(s, d) for s, d in datas if d]
    out = ["| operator | " + " | ".join(s for s, _ in datas) + " |",
           "|" + "---|" * (len(datas) + 1)]

    def ref_for(short: str, row: str, table) -> float | None:
        col = _BF16_REF_COL.get(short)
        return table[row][col] if col is not None and row in table else None

    def fmt(v, ref_ms, unit) -> str:
        if v is None:
            return "—"
        if isinstance(v, str):  # below-floor sentinel
            return v
        speedup = ""
        ms = v * 1e3 if unit == "s" else v
        if ref_ms is not None and ms > 0:
            speedup = f" ({ref_ms / ms:.1f}×)"
        return f"{v:.3g} {unit}{speedup}"

    for row in _BF16_ROWS_MS:
        cells = [
            fmt(d.get(f"{row} (ms)"), ref_for(short, row, _REF_MATVEC_MS),
                "ms")
            for short, d in datas
        ]
        if any(c != "—" for c in cells):
            out.append(f"| {row} | " + " | ".join(cells) + " |")
    for row in _BF16_ROWS_S + _BF16_ROWS_S_NOREF:
        cells = [
            fmt(d.get(f"{row} (s)"),
                ref_for(short, row, _REF_PRECOMPUTE_MS), "s")
            for short, d in datas
        ]
        if any(c != "—" for c in cells):
            out.append(f"| {row} | " + " | ".join(cells) + " |")
    # rank-r rows, whatever ranks are banked
    ranks = sorted({
        key[len("KFAC inverse build rank="):].split(" ")[0]
        for _, d in datas for key in d
        if key.startswith("KFAC inverse build rank=")
    }, key=int)
    for r in ranks:
        for template, unit in (
            (f"KFAC inverse build rank={r}", "s"),
            (f"KFAC inverse matvec rank={r}", "ms"),
        ):
            cells = []
            for _, d in datas:
                v = d.get(f"{template} ({unit})")
                cells.append(
                    "—" if v is None
                    else (v if isinstance(v, str) else f"{v:.3g} {unit}")
                )
            if any(c != "—" for c in cells):
                out.append(f"| {template} | " + " | ".join(cells) + " |")
    return "\n".join(out)


def write_bf16_block() -> bool:
    md = Path(__file__).parent / "RESULTS.md"
    text = md.read_text()
    begin, end = "<!-- bf16-table:begin -->", "<!-- bf16-table:end -->"
    i, j = text.index(begin), text.index(end)
    new = text[: i + len(begin)] + "\n" + bf16_table() + "\n" + text[j:]
    if new != text:
        md.write_text(new)
        return True
    return False


def main() -> None:
    speedup_tables()
    for dtype in ("float32", "bfloat16"):
        print(f"\n### {dtype} — ms / FLOPs / MFU / peak reserved (args+temp)\n")
        datas = [(short, _load(name, dtype)) for name, short in PROBLEMS]
        datas = [(s, d) for s, d in datas if d]
        header = "| row | " + " | ".join(s for s, _ in datas) + " |"
        print(header)
        print("|" + "---|" * (len(datas) + 1))
        for row in ROWS:
            cells = [_cell(d, row) for _, d in datas]
            if all(c == "—" for c in cells):
                continue
            print(f"| {row} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
