"""Render the headline speedup chart (one TPU v5e chip vs compiled reference).

Reads the measured numbers from RESULTS.md's source JSONs (hard-coded here
with their provenance) and writes ``benchmarks/speedups.png``, referenced by
the README. Single-series horizontal bars: magnitude only, one hue, value
labels at the bar ends, reference baseline at 1x.

Run: ``python benchmarks/plot_speedups.py``
"""

from __future__ import annotations

import pathlib

import matplotlib.pyplot as plt

# (label, reference ms [RTX A6000, torch.compile, BASELINE.md],
#  ours ms [1x TPU v5e, float32, benchmarks/results/*.json])
ROWS = [
    ("Hessian matvec · MNIST MLP", 1.79, 0.12),
    ("Empirical Fisher matvec · ResNet-18", 16.8, 1.59),
    ("GGN matvec · ResNet-18", 16.0, 1.58),
    ("MC-Fisher matvec · ResNet-18", 20.9, 2.30),
    ("EKFAC matvec · nanoGPT 124M", 65.7, 8.57),
    ("KFAC matvec · nanoGPT 124M", 36.0, 5.13),
    ("EKFAC matvec · ResNet-50", 17.0, 2.52),
    ("GGN matvec · nanoGPT 124M", 433.0, 104.9),
    ("Empirical Fisher matvec · nanoGPT 124M", 464.0, 127.1),
    ("Hessian matvec · nanoGPT 124M", 593.0, 168.8),
    ("GGN matvec · ResNet-50", 197.0, 63.8),
    ("Hessian matvec · ResNet-50", 253.0, 113.0),
]

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
