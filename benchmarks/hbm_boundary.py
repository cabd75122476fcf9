"""Measured HBM boundary: largest batch that fits one chip, per operator.

The compile-time ledger (``memory_analysis()``) provably diverges from
runtime here (the nanoGPT forward banked 0.0 GiB peak temp while the held
bf16 run OOMed on recomputed attention products), and the tunnel exposes no
runtime memory stats — so the boundary is established the direct way: run
the kernel at increasing batch sizes and record XLA's own OOM ledger on the
first failure.  This is the runtime-memory counterpart of the reference's
peak-memory table
(``/root/reference/docs/examples/basic_usage/example_benchmark.py:74-79``).

One probe per process invocation: a failed device allocation can leave the
tunnel wedged, so each (problem, op, dtype, batch) cell gets a fresh
process and merges its verdict into ``results/hbm_boundary.json``.

Usage::

    python benchmarks/hbm_boundary.py --problem imagenet_resnet50 \
        --op ggn --dtype bfloat16 --batch 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RESULTS = Path(__file__).parent / "results" / "hbm_boundary.json"


def _bank(key: str, entry: dict) -> None:
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    data[key] = entry
    RESULTS.write_text(json.dumps(data, indent=2, sort_keys=True))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", required=True)
    ap.add_argument("--op", required=True, choices=["ggn", "kfac", "ekfac"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, required=True)
    args = ap.parse_args()

    import curvlinops_tpu as cl
    from curvlinops_tpu.models import PROBLEMS

    key = f"{args.problem}/{args.op}/{args.dtype}/B={args.batch}"
    print(f"probing {key} on {jax.devices()[0]}", flush=True)

    prob = PROBLEMS["synthetic_" + args.problem](
        batch_size=args.batch, dtype=jnp.dtype(args.dtype)
    )
    kw = dict(check_deterministic=False)
    t0 = time.perf_counter()
    try:
        if args.op == "ggn":
            A = cl.GGNLinearOperator(
                prob.model_fn, prob.loss_fn, prob.params, prob.data, **kw
            )
            params = prob.params
        elif args.op == "kfac":
            A = cl.KFACLinearOperator(
                prob.kfac_model_fn, prob.loss_fn, prob.kfac_params,
                prob.data, fisher_type=cl.FisherType.MC, **kw
            )
            params = prob.kfac_params
        else:
            A = cl.EKFACLinearOperator(
                prob.kfac_model_fn, prob.loss_fn, prob.kfac_params,
                prob.data, fisher_type=cl.FisherType.MC, **kw
            )
            params = prob.kfac_params
        v = jax.tree.map(lambda p: 0.01 * jnp.ones(p.shape, p.dtype), params)
        out = A @ v
        # single-scalar readback barrier (per-leaf readbacks serialize 30ms
        # round trips; block_until_ready has returned early on this runtime)
        s = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out))
        val = float(s)
        ok = bool(jnp.isfinite(jnp.asarray(val)))
        entry = {
            "fits": True,
            "finite": ok,
            "wall_s": round(time.perf_counter() - t0, 1),
            "device": str(jax.devices()[0]),
        }
        print(f"FITS ({entry['wall_s']}s, finite={ok})", flush=True)
    except Exception as e:  # noqa: BLE001 — the verdict IS the exception
        msg = str(e)
        low = msg.lower()
        # TPU compile-time reservation failures say "Ran out of memory in
        # memory space hbm. Used X of Y"; runtime allocs say
        # RESOURCE_EXHAUSTED; match case-insensitively on all known forms.
        markers = [
            "resource_exhausted",
            "out of memory",
            "allocation type: hlo temp",  # the OOM ledger itself
        ]
        matched = next((m for m in markers if m in low), None)
        if matched is None and "exceeds the" in low and "memory" in low:
            matched = "exceeds the ... memory"
        if matched is None:
            raise
        # bank the lines AROUND the matched marker (the head of a remote
        # compile failure is axon service noise; the OOM ledger sits deeper)
        lines = msg.splitlines()
        needle = (
            "exceeds the" if matched == "exceeds the ... memory" else matched
        )
        idx = next(
            (i for i, ln in enumerate(lines) if needle in ln.lower()), 0
        )
        evidence = "\n".join(lines[max(0, idx - 2): idx + 12])[:2000]
        entry = {
            "fits": False,
            "oom_matched_marker": matched,
            "oom_evidence": evidence,
            "oom_ledger_head": msg[:600],
            "wall_s": round(time.perf_counter() - t0, 1),
            "device": str(jax.devices()[0]),
        }
        print(f"OOM after {entry['wall_s']}s", flush=True)
    _bank(key, entry)


if __name__ == "__main__":
    main()
