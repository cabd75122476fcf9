"""Microbenchmark: randomized rank-r vs exact eigh KFAC inverse builds.

The exact-damped inverse is eigh-bound on TPU (RESULTS.md; ``micro_eigh.py``
closed the single-chip eigh kernel question: XLA's default lowering wins).
``inverse(rank=r)`` replaces the full eigendecomposition of every
larger-than-``r`` factor with a randomized subspace decomposition that is
pure MXU matmuls plus ONE batched ``[r, r]`` eigh across the whole model
(``kfac/randomized.py``, RS-KFAC arXiv:2206.15397).

This measures, at the 124M-GPT factor stack shapes:

- exact build: ``batched_eigh`` on the [12, D, D] stacks (the measured
  eigh-bound phase), and
- randomized build at several ranks: ``batched_randomized_eigh`` +
  sector-scale precompute,

plus the QUALITY of each rank: relative error of the randomized damped
inverse against the exact one applied to a random vector (computed on
synthetic factors with a controlled power-law spectrum matching observed
KFAC decay), and the inverse-matvec cost of both forms.

One-shot walls are bounded by an all-leaves-to-one-scalar readback
(the build-phase convention from RESULTS.md); matvec rates use the
marginal-rate chain.

Usage::

    python benchmarks/micro_randomized_inverse.py [--cpu]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

if "--cpu" in sys.argv:
    _jax_cfg.config.update("jax_platforms", "cpu")
_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.kfac.chain import batched_eigh
from curvlinops_tpu.kfac.randomized import (
    batched_randomized_eigh,
    lr_apply_stacked,
    lr_damped_inverse_data,
)

# the 124M GPT's KFAC factor stacks (RESULTS.md / micro_eigh.py):
# attention qkv [12, 769->2304], proj [12, 769], mlp up [12, 769->3072],
# mlp down [12, 3073->769]; square factor sides below
SHAPES = {
    "aaT_qkv": (12, 769),
    "ggT_qkv": (12, 2304),
    "aaT_mlp": (12, 769),
    "ggT_mlp": (12, 3072),
    "aaT_down": (12, 3073),
    "ggT_down": (12, 769),
}
RANKS = (128, 256, 512)
if "--smoke" in sys.argv:  # tiny-shape correctness pass (CPU)
    SHAPES = {k: (3, max(s // 16, 8)) for k, (L, s) in SHAPES.items()}
    RANKS = (16, 32)
DAMPING = 1e-3
DECAY = 2.0  # power-law exponent lam_i ~ i^-DECAY (typical KFAC spectra)


def synth_factor(key, L, D):
    """PSD stack with power-law spectrum in a random basis (cheap: no QR)."""
    ks = jax.random.split(key, 2)
    B = jax.random.normal(ks[0], (L, D, D)) / jnp.sqrt(D)
    lam = (1.0 + jnp.arange(D, dtype=jnp.float32)) ** (-DECAY)
    # B diag(lam) B^T has the prescribed decay up to the random basis
    return jnp.einsum(
        "lde,e,lfe->ldf", B, lam, B, precision=jax.lax.Precision.HIGHEST
    )


def one_shot(fn, *args):
    """Wall of one call, bounded by an all-leaves-to-one-scalar readback."""
    t0 = time.perf_counter()
    out = fn(*args)
    s = sum(jnp.sum(leaf[..., -1]) for leaf in jax.tree.leaves(out))
    float(s)
    return time.perf_counter() - t0, out


def loop_rate_ms(kernel, v, *consts, n2=20):
    """Per-application ms via ``run.py::_timed_loop`` — ONE loop-timing
    harness repo-wide (median over repeats, resolution-floor escalation,
    non-negative clamp).  Large operator state (bases, spectra) must come
    in via ``*consts`` — closure-captured arrays become HLO constants and
    the remote compile service rejects >~100 MB request bodies (HTTP 413).
    """
    import run as _run

    _run.REPEATS_IN_LOOP = n2
    ms, _, _ = _run._timed_loop(kernel, v, *consts)
    return ms


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    mats = {
        name: synth_factor(jax.random.key(i), L, D)
        for i, (name, (L, D)) in enumerate(SHAPES.items())
    }
    results = {
        "device": str(jax.devices()[0]),
        "damping": DAMPING,
        "decay": DECAY,
    }

    # exact build (the eigh-bound phase), warm then timed
    exact_fn = jax.jit(batched_eigh)
    one_shot(exact_fn, mats)
    t_exact, eig = one_shot(exact_fn, mats)
    print(f"exact batched_eigh build: {t_exact:.3f} s", flush=True)
    results["exact build (s)"] = round(t_exact, 4)

    # exact damped-inverse matvec on the qkv block (the cost the rank-r
    # sector apply must be compared against)
    lamA0, QA0 = eig["aaT_qkv"]
    lamG0, QG0 = eig["ggT_qkv"]
    L, dA = SHAPES["aaT_qkv"]
    dG = SHAPES["ggT_qkv"][1]
    inv_lam0 = 1.0 / (
        (lamA0[:, :, None] * lamG0[:, None, :]).reshape(L, -1) + DAMPING
    )

    def exact_apply_norm(v, QA, QG, inv_lam):
        X = v.reshape(L, dA, dG, -1)
        W = jnp.einsum("lda,ldgk->lagk", QA, X)
        W = jnp.einsum("lgb,lagk->labk", QG, W)
        W = inv_lam.reshape(L, dA, dG)[..., None] * W
        W = jnp.einsum("lda,labk->ldbk", QA, W)
        W = jnp.einsum("lgb,ldbk->ldgk", QG, W)
        out = W.reshape(L * dA * dG, -1)
        return out / jnp.linalg.norm(out)  # keep the iteration bounded

    v0 = jax.random.normal(jax.random.key(7), (L * dA * dG, 1))
    t_mv_exact = loop_rate_ms(exact_apply_norm, v0, QA0, QG0, inv_lam0)
    print(f"exact inverse matvec: {t_mv_exact:.3f} ms", flush=True)
    results["exact inverse matvec (ms)"] = round(t_mv_exact, 4)

    for rank in RANKS:
        fn = jax.jit(
            lambda m, r=rank: batched_randomized_eigh(
                m, r, jax.random.key(0), power_iters=1
            )
        )
        one_shot(fn, mats)
        t_rand, reig = one_shot(fn, mats)
        print(f"randomized build rank={rank}: {t_rand:.3f} s", flush=True)
        results[f"randomized build rank={rank} (s)"] = round(t_rand, 4)

        # quality: lr damped inverse vs exact damped inverse on the qkv block
        lamA, QA = eig["aaT_qkv"]
        lamG, QG = eig["ggT_qkv"]
        kron_lam = (lamA[:, :, None] * lamG[:, None, :]).reshape(L, -1)
        inv_lam = 1.0 / (kron_lam + DAMPING)
        v = jax.random.normal(jax.random.key(7), (L * dA * dG, 1))

        @jax.jit
        def exact_apply(QA, QG, inv_lam, v):
            X = v.reshape(L, dA, dG, -1)
            W = jnp.einsum("lda,ldgk->lagk", QA, X)
            W = jnp.einsum("lgb,lagk->labk", QG, W)
            W = inv_lam.reshape(L, dA, dG)[..., None] * W
            W = jnp.einsum("lda,labk->ldbk", QA, W)
            W = jnp.einsum("lgb,ldbk->ldgk", QG, W)
            return W.reshape(L * dA * dG, -1)

        data = lr_damped_inverse_data(
            reig["aaT_qkv"], reig["ggT_qkv"], DAMPING
        )
        got = lr_apply_stacked(data, v)
        want = exact_apply(QA, QG, inv_lam, v)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        print(f"  qkv-block inverse rel err vs exact: {rel:.4f}", flush=True)
        results[f"rank={rank} qkv inverse rel err"] = round(rel, 5)

        # rank-r inverse matvec cost (same loop-rate methodology; sector
        # data rides as jit arguments, never closure constants)
        def lr_apply_norm(m, *data_args):
            out = lr_apply_stacked(tuple(data_args), m)
            return out / jnp.linalg.norm(out)

        t_mv = loop_rate_ms(lr_apply_norm, v, *data)
        print(f"  rank={rank} inverse matvec: {t_mv:.3f} ms", flush=True)
        results[f"rank={rank} inverse matvec (ms)"] = round(t_mv, 4)

    if "--smoke" not in sys.argv:
        out = (
            Path(__file__).parent / "results" / "micro_randomized_inverse.json"
        )
        out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
