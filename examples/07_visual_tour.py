"""Worked example: visual tour of the curvature zoo.

Counterpart of the reference's ``example_visual_tour.py``
(``docs/examples/basic_usage/example_visual_tour.py``): materialize the
Hessian, GGN, empirical Fisher, KFAC, and EKFAC of one small CNN as dense
matrices (``A @ I`` — every column is one matvec) and render them side by
side on a log-magnitude scale with parameter-block separators. KFAC/EKFAC
visibly keep only the layer-diagonal blocks.

Run: ``python examples/07_visual_tour.py`` (writes ``visual_tour.png``
next to this file; skips the figure when matplotlib is unavailable).
"""

import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import curvlinops_tpu as cl


def make_problem():
    key = jax.random.key(0)
    kw1, kb1, kw2, kb2, kx, ky = jax.random.split(key, 6)
    params = {
        "conv": {
            "W": 0.3 * jax.random.normal(kw1, (3, 3, 2, 3)),  # HWIO
            "b": 0.05 * jax.random.normal(kb1, (3,)),
        },
        "dense": {
            "W": 0.3 * jax.random.normal(kw2, (3 * 4 * 4, 4)),
            "b": 0.05 * jax.random.normal(kb2, (4,)),
        },
    }

    def model_fn(p, x):  # x: [N, 8, 8, 2]
        z = jax.lax.conv_general_dilated(
            x, p["conv"]["W"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        z = jax.nn.sigmoid(z + p["conv"]["b"])
        z = z.reshape(z.shape[0], -1)
        return z @ p["dense"]["W"] + p["dense"]["b"]

    N = 40
    X = jax.random.normal(kx, (N, 8, 8, 2))
    y = jax.random.randint(ky, (N,), 0, 4)
    data = [(X[:20], y[:20]), (X[20:], y[20:])]
    return model_fn, cl.CrossEntropyLoss("mean"), params, data


def main():
    model_fn, loss_fn, params, data = make_problem()
    dim = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    boundaries = np.cumsum(
        [int(np.prod(p.shape)) for p in jax.tree.leaves(params)]
    )[:-1]
    identity = np.eye(dim, dtype=np.float32)

    common = dict(check_deterministic=False)
    mats = {
        "Hessian": cl.HessianLinearOperator(model_fn, loss_fn, params, data,
                                            **common) @ identity,
        "GGN": cl.GGNLinearOperator(model_fn, loss_fn, params, data,
                                    **common) @ identity,
        "Empirical Fisher": cl.EFLinearOperator(model_fn, loss_fn, params,
                                                data, **common) @ identity,
        "KFAC": cl.KFACLinearOperator(model_fn, loss_fn, params, data,
                                      **common) @ identity,
        "EKFAC": cl.EKFACLinearOperator(model_fn, loss_fn, params, data,
                                        **common) @ identity,
    }

    ggn = mats["GGN"]
    rels = {}
    for name, mat in mats.items():
        rels[name] = np.linalg.norm(mat - ggn) / np.linalg.norm(ggn)
        print(f"{name:17s} ||A||_F = {np.linalg.norm(mat):8.4f}   "
              f"||A - GGN||_F / ||GGN||_F = {rels[name]:6.4f}")
    # every operator must be symmetric; the approximation ordering the tour
    # illustrates must hold (the KFAC family sits closer to the GGN than
    # the empirical Fisher; EKFAC is optimal in the KFAC eigenbasis, not in
    # Frobenius distance, so no EKFAC<=KFAC claim)
    for name, mat in mats.items():
        assert np.allclose(mat, mat.T, atol=1e-4), f"{name} not symmetric"
    assert rels["GGN"] == 0.0
    assert max(rels["KFAC"], rels["EKFAC"]) < rels["Empirical Fisher"], rels

    try:
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping the figure")
        return

    fig, axes = plt.subplots(1, len(mats), figsize=(4 * len(mats), 4.4))
    floor = 1e-8
    vmax = max(np.abs(m).max() for m in mats.values())
    for ax, (name, mat) in zip(axes, mats.items()):
        # magnitude -> sequential single-hue ramp on a log scale
        img = ax.imshow(
            np.log10(np.abs(mat) + floor), cmap="Blues",
            vmin=np.log10(floor), vmax=np.log10(vmax),
        )
        for cut in boundaries:  # parameter-block separators
            ax.axhline(cut - 0.5, color="#999999", lw=0.6)
            ax.axvline(cut - 0.5, color="#999999", lw=0.6)
        ax.set_title(name, fontsize=11)
        ax.set_xticks([]), ax.set_yticks([])
    fig.colorbar(img, ax=axes, shrink=0.8, label=r"$\log_{10}|A_{ij}|$")
    # VISUAL_TOUR_OUT lets the test suite render to a temp dir instead of
    # dirtying the committed figure
    out = pathlib.Path(
        os.environ.get("VISUAL_TOUR_OUT", pathlib.Path(__file__).parent)
    ) / "visual_tour.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"figure written to {out}")


if __name__ == "__main__":
    main()
