"""Feasibility ledger for a blocked-Jacobi eigh at KFAC factor shapes.

VERDICT round-2 item 8: one last single-chip attempt at the eigh bound
(`micro_eigh.py`: XLA's default batched lowering beats vmapped QDWH (4x),
the TPU Jacobi custom call OOMs, bigger termination blocks fail). The
remaining untried design is a two-sided BLOCK-Jacobi built from the two
primitives a TPU is actually good at — batched small eighs and batched
block-row/column rotation matmuls (MXU):

    per sweep: (N_b - 1) rounds x [ gather P=N_b/2 disjoint 2b x 2b pair
    subproblems -> batched eigh -> rotate the two block rows + two block
    columns + accumulate V with [2b, 2b] @ [2b, D] matmuls ]

Convergence needs ~6-10 sweeps (quadratic once nearly diagonal). Whether
this can beat XLA's direct eigh is decided by the per-round cost of its two
primitives — so this script measures exactly those, at the real GPT-2
factor stack shapes [12, D, D], and prints the derived full-solve cost next
to the measured XLA direct eigh. No full solver is built unless the ledger
says it can win; the result closes the single-chip eigh item either way.

Usage (TPU tunnel up)::

    python benchmarks/micro_block_jacobi.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

L = 12  # GPT-2 factor stack length
SWEEPS = 8  # typical cyclic block-Jacobi sweep count to fp32 accuracy


def timed(fn, *args, reps: int = 3) -> float:
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[-1]))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    key = jax.random.key(0)
    results: dict = {"device": str(jax.devices()[0]), "sweeps_assumed": SWEEPS}

    for D in (2304, 3072):
        row: dict = {}
        # XLA direct: the incumbent
        A = jax.random.normal(jax.random.fold_in(key, D), (L, D, D))
        A = A @ jnp.swapaxes(A, -1, -2) / D + 0.1 * jnp.eye(D)
        t_direct = timed(jnp.linalg.eigh, A)
        row["XLA direct eigh (s)"] = round(t_direct, 3)

        for b in (128, 256):
            n_b = math.ceil(D / b)
            if n_b % 2:
                n_b += 1  # round-robin needs an even block count
            P = n_b // 2
            rounds = n_b - 1
            batch = L * P

            # primitive 1: the rotation subproblems, batched eigh [L*P, 2b, 2b]
            S = jax.random.normal(jax.random.fold_in(key, D + b), (batch, 2 * b, 2 * b))
            S = S @ jnp.swapaxes(S, -1, -2) / (2 * b) + 0.1 * jnp.eye(2 * b)
            t_eigh = timed(jnp.linalg.eigh, S)

            # primitive 2: rotate two block rows (and, by symmetry of cost,
            # two block columns + the V accumulation): [L*P, 2b, 2b] @
            # [L*P, 2b, D] — 3 such applications per round (rows, cols, V)
            J = jax.random.normal(jax.random.fold_in(key, D + b + 1), (batch, 2 * b, 2 * b))
            R = jax.random.normal(jax.random.fold_in(key, D + b + 2), (batch, 2 * b, D))
            t_rot = timed(
                lambda j, r: jnp.einsum(
                    "bij,bjk->bik", jnp.swapaxes(j, -1, -2), r
                ),
                J,
                R,
            )

            per_round = t_eigh + 3 * t_rot
            total = per_round * rounds * SWEEPS
            row[f"b={b} base eigh [{batch},{2*b}] (s)"] = round(t_eigh, 4)
            row[f"b={b} rotation matmul (s)"] = round(t_rot, 4)
            row[f"b={b} derived full solve (s)"] = round(total, 2)
            row[f"b={b} verdict"] = (
                "WINS" if total < t_direct else "loses"
            ) + f" vs direct {t_direct:.2f}s"
            print(
                f"D={D} b={b}: eigh[{batch},{2*b}]={t_eigh:.3f}s "
                f"rot={t_rot:.4f}s x3 x{rounds} rounds x{SWEEPS} sweeps "
                f"= {total:.2f}s vs direct {t_direct:.2f}s",
                file=sys.stderr,
            )
        results[f"D={D}"] = row

    out = Path(__file__).parent / "results" / "micro_block_jacobi.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
