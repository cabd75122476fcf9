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


def main() -> None:
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
