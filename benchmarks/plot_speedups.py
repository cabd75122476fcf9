"""Render the headline speedup chart (one TPU v5e chip vs compiled reference).

Reads the measured numbers from the banked per-problem result JSONs (the
same source ``make_stats_table.py`` renders RESULTS.md's tables from; the
reference baselines live in ``make_stats_table._REF_MATVEC_MS``) and writes
``benchmarks/speedups.png``, referenced by the README. Single-series
horizontal bars: magnitude only, one hue, value labels at the bar ends,
reference baseline at 1x.

Run: ``python benchmarks/plot_speedups.py``
"""

from __future__ import annotations

import pathlib
import sys

import matplotlib.pyplot as plt

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from make_stats_table import _REF_MATVEC_MS, _load  # noqa: E402

_PRETTY = {
    "synthetic_mnist_mlp": "MNIST MLP",
    "synthetic_cifar10_resnet18": "ResNet-18",
    "synthetic_imagenet_resnet50": "ResNet-50",
    "synthetic_shakespeare_nanogpt": "nanoGPT 124M",
}
_PICK = [  # (row key, problem index into _REF_MATVEC_MS column order)
    ("Hessian matvec", 0),
    ("Empirical Fisher matvec", 1),
    ("GGN matvec", 1),
    ("MC-Fisher matvec", 1),
    ("EKFAC matvec", 3),
    ("KFAC matvec", 3),
    ("EKFAC matvec", 2),
    ("GGN matvec", 3),
    ("Empirical Fisher matvec", 3),
    ("Hessian matvec", 3),
    ("GGN matvec", 2),
    ("Hessian matvec", 2),
]
_NAMES = list(_PRETTY)


def _rows() -> list[tuple[str, float, float]]:
    datas = {name: _load(name, "float32") for name in _NAMES}
    rows = []
    for key, pi in _PICK:
        name = _NAMES[pi]
        ours = datas[name].get(f"{key} (ms)")
        if not isinstance(ours, (int, float)) or ours <= 0:
            # never drop a bar silently — the README text enumerates rows
            print(f"WARNING: dropping bar '{key} · {_PRETTY[name]}' "
                  f"(banked value: {ours!r})")
            continue
        ref = _REF_MATVEC_MS[key][pi]
        rows.append((f"{key} · {_PRETTY[name]}", ref, ours))
    return rows


ROWS = _rows()

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
SERIES = "#2a78d6"


def main() -> None:
    rows = sorted(ROWS, key=lambda r: r[1] / r[2])
    labels = [r[0] for r in rows]
    speedups = [r[1] / r[2] for r in rows]

    fig, ax = plt.subplots(figsize=(8.6, 0.42 * len(rows) + 1.2))
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    y = range(len(rows))
    ax.barh(y, speedups, height=0.55, color=SERIES, zorder=3)
    for yi, s in zip(y, speedups):
        ax.text(s + 0.35, yi, f"{s:.1f}×", va="center", ha="left",
                fontsize=9, color=INK)

    ax.axvline(1.0, color=INK_2, lw=0.8, zorder=2)
    ax.text(1.1, -0.62, "reference = 1×", fontsize=8, color=INK_2,
            va="top", ha="left")

    ax.set_yticks(list(y), labels, fontsize=9, color=INK)
    ax.set_xlabel("speedup over curvlinops (RTX A6000, torch.compile)",
                  fontsize=9, color=INK_2)
    ax.set_title("curvlinops-tpu · one TPU v5e chip, float32",
                 fontsize=11, color=INK, loc="left")
    ax.tick_params(colors=INK_2, labelsize=8)
    for spine in ("top", "right", "left"):
        ax.spines[spine].set_visible(False)
    ax.spines["bottom"].set_color(INK_2)
    ax.xaxis.grid(True, color="#e5e4e0", lw=0.7, zorder=0)
    ax.set_axisbelow(True)
    ax.set_xlim(0, max(speedups) * 1.14)

    out = pathlib.Path(__file__).parent / "speedups.png"
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
