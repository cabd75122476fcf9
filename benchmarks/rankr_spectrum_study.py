"""Why rank-r inverse quality differs between synthetic and real factors.

Round 4's micro benchmark (``micro_randomized_inverse.py``) measured
rank-128 rel err ~5e-3 on SYNTHETIC power-law-2 spectra; the round-5
real-factor rows (``run.py --rank``) measured **0.35** on the 124M GPT.
This study isolates the cause on a CPU-sized GPT with REAL factor builds:
the benchmark problems are at RANDOM INIT, where activation/gradient
covariances are near-isotropic (high effective rank), so a rank-r basis
captures little of the trace and the tail-mean approximation carries the
inverse. After training, spectra develop the decay the micro assumed and
rank-r error falls.

Banked: per-factor spectrum decay stats (effective rank, trace share of
the top-r eigenspace), damped-inverse rel err per rank, and the
natural-gradient cosine vs the exact-damped inverse — at init and after
training. CPU-only (numerics, not timings).

Usage::

    python benchmarks/rankr_spectrum_study.py
"""

from __future__ import annotations

import json
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import sys  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from functools import partial  # noqa: E402

from curvlinops_tpu import CrossEntropyLoss  # noqa: E402
from curvlinops_tpu.curvature.ggn import GGNLinearOperator  # noqa: E402
from curvlinops_tpu.kfac.operator import KFACLinearOperator  # noqa: E402
from curvlinops_tpu.models.gpt import (  # noqa: E402
    GPTConfig,
    gpt_apply,
    init_gpt,
)
from curvlinops_tpu.models.resnet import kfac_restricted  # noqa: E402

CFG = GPTConfig(block_size=64, vocab_size=128, n_layer=2, n_head=4, n_embd=128)
B = 8
DAMPING = 1e-3
RANKS = (16, 32, 64, 128)
STEPS = 400


def make_data(key, n_batches=2):
    """Structured next-token data (affine map + noise): trainable signal."""
    ks = jax.random.split(key, n_batches)
    batches = []
    for k in ks:
        x = jax.random.randint(k, (B, CFG.block_size), 0, CFG.vocab_size)
        y = (5 * x + 3) % CFG.vocab_size
        flip = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.05, y.shape)
        noise = jax.random.randint(
            jax.random.fold_in(k, 2), y.shape, 0, CFG.vocab_size
        )
        y = jnp.where(flip, noise, y)
        batches.append((x, y.reshape(-1)))
    return batches


model_fn = partial(gpt_apply, config=CFG)  # flattened [(B*T), V] logits


def loss_value(params, batch):
    x, y = batch
    logits = model_fn(params, x)
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


def spectrum_stats(kfac):
    """Per-factor decay diagnostics from the operator's factor state."""
    stats = []
    state = kfac.state_dict()
    for name in ("aaT", "ggT"):
        for gi, S in state[name].items():
            S = np.asarray(S, np.float64)
            if S.ndim != 2 or S.shape[0] != S.shape[1] or S.shape[0] < 2:
                continue
            w = np.linalg.eigvalsh(S)[::-1]
            tr = float(w.sum())
            stats.append({
                "factor": f"{name}[{gi}]",
                "dim": int(S.shape[0]),
                "effective_rank": round(tr / float(w[0]), 2),
                "top16_trace_share": round(float(w[:16].sum()) / tr, 4),
                "top128_trace_share": round(
                    float(w[:128].sum()) / tr, 4
                ),
            })
    return stats


def rel_err(exact_out, approx_out):
    num = den = 0.0
    for e, a in zip(jax.tree.leaves(exact_out), jax.tree.leaves(approx_out)):
        num += float(jnp.sum((e - a) ** 2))
        den += float(jnp.sum(e**2))
    return float(np.sqrt(num / den))


def cosine(a, b):
    av = np.concatenate([np.ravel(x) for x in jax.tree.leaves(a)])
    bv = np.concatenate([np.ravel(x) for x in jax.tree.leaves(b)])
    return float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv)))


def analyze(params, data, label):
    # the same restriction run.py's problem setup applies (embeddings and
    # LayerNorm affines travel frozen)
    kfac_model_fn, kparams = kfac_restricted(model_fn, params)
    loss_fn = CrossEntropyLoss("mean")
    kfac = KFACLinearOperator(
        kfac_model_fn, loss_fn, kparams, data,
        fisher_type="mc", mc_samples=1, check_deterministic=False,
    )
    g_op = GGNLinearOperator(
        kfac_model_fn, loss_fn, kparams, data, check_deterministic=False
    )
    grad, loss = g_op.gradient_and_loss()

    exact = kfac.inverse(damping=DAMPING, use_exact_damping=True)
    nat_exact = exact @ grad
    probe = jax.tree.map(lambda p: 0.01 * jnp.ones(p.shape), kparams)
    exact_probe = exact @ probe

    row = {"label": label, "loss": round(float(loss), 4),
           "spectra": spectrum_stats(kfac), "ranks": {}}
    for r in RANKS:
        rinv = kfac.inverse(
            damping=DAMPING, use_exact_damping=True, rank=r
        )
        row["ranks"][str(r)] = {
            "rel_err_ones_probe": round(
                rel_err(exact_probe, rinv @ probe), 4
            ),
            "rel_err_grad": round(
                rel_err(nat_exact, rinv @ grad), 4
            ),
            "natgrad_cosine_vs_exact": round(
                cosine(nat_exact, rinv @ grad), 4
            ),
        }
    heur = kfac.inverse(damping=DAMPING, use_heuristic_damping=True)
    row["heuristic_natgrad_cosine_vs_exact"] = round(
        cosine(nat_exact, heur @ grad), 4
    )

    # damping sweep at a fixed rank: the tail-mean replacement is coarse
    # exactly where tail eigenvalue products exceed the damping, so rank-r
    # inverse error must FALL as damping grows
    row["damping_sweep_rank64"] = {}
    for d in (1e-4, 1e-3, 1e-2, 1e-1):
        ex_d = kfac.inverse(damping=d, use_exact_damping=True)
        nat_d = ex_d @ grad
        r_d = kfac.inverse(damping=d, use_exact_damping=True, rank=64)
        row["damping_sweep_rank64"][f"{d:g}"] = {
            "rel_err_grad": round(rel_err(nat_d, r_d @ grad), 4),
            "natgrad_cosine": round(cosine(nat_d, r_d @ grad), 4),
        }
    return row


def main():
    key = jax.random.key(0)
    params = init_gpt(key, CFG)
    data = make_data(jax.random.key(1))

    rows = [analyze(params, data, "random init")]
    print(json.dumps(rows[-1]["ranks"], indent=1))

    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    step = jax.jit(
        lambda p, s, b: (lambda g: (
            lambda u, ns: (optax.apply_updates(p, u), ns)
        )(*opt.update(g, s, p)))(jax.grad(loss_value)(p, b))
    )
    train_data = make_data(jax.random.key(2), n_batches=8)
    for i in range(STEPS):
        params, opt_state = step(params, opt_state, train_data[i % 8])
    final_loss = float(loss_value(params, data[0]))
    print("trained loss:", round(final_loss, 4))

    rows.append(analyze(params, data, f"after {STEPS} adam steps"))
    print(json.dumps(rows[-1]["ranks"], indent=1))

    out = Path(__file__).parent / "results" / "rankr_spectrum_study.json"
    out.write_text(json.dumps({
        "config": {"n_layer": CFG.n_layer, "n_embd": CFG.n_embd,
                   "block_size": CFG.block_size,
                   "vocab": CFG.vocab_size, "batch": B,
                   "damping": DAMPING, "train_steps": STEPS},
        "rows": rows,
    }, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
