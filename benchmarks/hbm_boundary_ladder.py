"""Driver for the measured HBM-boundary table (``hbm_boundary.py``).

For each (problem, operator, dtype) cell, probes power-of-two batch sizes —
doubling while the kernel fits, halving while it OOMs — until the boundary
is bracketed (largest fitting B and 2B OOM), with each probe in a fresh
subprocess (a failed device allocation can wedge the tunnel; the ladder
probes tunnel health between cells and waits it out).  Results merge into
``results/hbm_boundary.json``; re-running skips banked probes, so the
ladder is resumable after tunnel outages.

Cells are ordered so the most informative rows land first (GGN everywhere,
then the build-heavy KFAC/EKFAC columns).

Usage (TPU tunnel up, no other TPU process)::

    python benchmarks/hbm_boundary_ladder.py [--max-probes N]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
RESULTS = HERE / "results" / "hbm_boundary.json"

# (problem, op, dtype, seed batch) in priority order.  Seeds are the
# power-of-two at/under the boundary PREDICTED from the banked
# compile-time memory columns (peak temp + data scale linearly in B;
# 15.75 GiB usable per the XLA OOM ledger) — so most cells resolve in
# 2-3 probes: seed (expect FITS), 2x seed (expect OOM), maybe one bisect.
# The measured verdicts then confirm or refute the compile-time ledger,
# which is exactly the question this table answers.
CELLS = [
    ("shakespeare_nanogpt", "ggn", "float32", 8),
    ("shakespeare_nanogpt", "ggn", "bfloat16", 16),
    ("cifar10_resnet18", "ggn", "float32", 16384),
    ("cifar10_resnet18", "ggn", "bfloat16", 32768),
    ("imagenet_resnet50", "ggn", "float32", 128),
    ("imagenet_resnet50", "ggn", "bfloat16", 256),
    ("cifar10_vit", "ggn", "float32", 256),
    ("cifar10_vit", "ggn", "bfloat16", 512),
    ("shakespeare_nanogpt", "kfac", "float32", 8),
    ("imagenet_resnet50", "kfac", "float32", 128),
    ("cifar10_resnet18", "kfac", "float32", 16384),
    ("cifar10_vit", "kfac", "float32", 256),
    ("shakespeare_nanogpt", "ekfac", "float32", 8),
    ("imagenet_resnet50", "ekfac", "float32", 128),
    ("cifar10_resnet18", "ekfac", "float32", 16384),
    ("cifar10_vit", "ekfac", "float32", 256),
    ("mnist_mlp", "ggn", "float32", 2097152),
    ("mnist_mlp", "kfac", "float32", 1048576),
    # bf16 build columns, seeded at 2x the measured f32 boundary (bf16
    # bought exactly one doubling on every GGN conv-net row) except ViT,
    # whose GGN boundary was dtype-independent (fp32 attention temps)
    ("shakespeare_nanogpt", "kfac", "bfloat16", 32),
    ("imagenet_resnet50", "kfac", "bfloat16", 512),
    ("cifar10_resnet18", "kfac", "bfloat16", 65536),
    ("cifar10_vit", "kfac", "bfloat16", 2048),
    ("shakespeare_nanogpt", "ekfac", "bfloat16", 16),
    ("imagenet_resnet50", "ekfac", "bfloat16", 512),
    ("cifar10_resnet18", "ekfac", "bfloat16", 16384),
    ("cifar10_vit", "ekfac", "bfloat16", 512),
    # mnist completion cells (round 5): ekfac f32 + the bf16 column
    ("mnist_mlp", "ekfac", "float32", 1048576),
    ("mnist_mlp", "ggn", "bfloat16", 2097152),
    ("mnist_mlp", "kfac", "bfloat16", 2097152),
    ("mnist_mlp", "ekfac", "bfloat16", 1048576),
]

MAX_BATCH = 1 << 23  # ladder safety stop: beyond this, "boundary > 8M"


def banked() -> dict:
    return json.loads(RESULTS.read_text()) if RESULTS.exists() else {}


def cell_probes(data: dict, problem: str, op: str, dtype: str) -> dict[int, bool]:
    prefix = f"{problem}/{op}/{dtype}/B="
    return {
        int(k[len(prefix):]): v["fits"]
        for k, v in data.items()
        if k.startswith(prefix)
    }


def next_batch(probes: dict[int, bool], seed: int) -> int | None:
    """Next power-of-two batch to probe, or None when bracketed."""
    fits = [b for b, ok in probes.items() if ok]
    ooms = [b for b, ok in probes.items() if not ok]
    if not probes:
        return seed
    hi = max(fits) if fits else None
    lo = min(ooms) if ooms else None
    if hi is not None and lo is not None:
        if lo <= 2 * hi:
            return None  # bracketed
        # gap wider than 2x (mixed seeds): bisect geometrically on pow2
        mid = 1 << ((hi.bit_length() + (lo - 1).bit_length()) // 2)
        return mid if hi < mid < lo else None
    if hi is not None:  # everything fits so far — jump to the seed if above
        nxt = max(2 * hi, seed if seed > hi else 0)
        return None if nxt > MAX_BATCH else nxt
    # everything OOMs so far — jump to the seed if below
    nxt = min(lo // 2, seed if seed < lo else lo // 2)
    return None if nxt < 1 else nxt


def tunnel_up(max_tries: int = 40) -> bool:
    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax,jax.numpy as jnp;"
                 "print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))"],
                capture_output=True, timeout=300, text=True,
            )
            ok = r.returncode == 0 and "2097152" in r.stdout
        except subprocess.TimeoutExpired:
            # a wedged tunnel hangs the child past its timeout — the exact
            # condition this function probes; never let it crash the ladder
            ok = False
        if ok:
            return True
        print(f"tunnel probe {i+1} failed; waiting 60s", flush=True)
        time.sleep(60)
    return False


def run_probe(problem: str, op: str, dtype: str, b: int, timeout_s: int):
    """One hbm_boundary.py subprocess; None return means it timed out."""
    try:
        return subprocess.run(
            [sys.executable, str(HERE / "hbm_boundary.py"),
             "--problem", problem, "--op", op,
             "--dtype", dtype, "--batch", str(b)],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"[timeout] {problem}/{op}/{dtype} B={b} after {timeout_s}s "
              "(child killed; tunnel may wedge for a minute)", flush=True)
        time.sleep(120)
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-probes", type=int, default=100)
    ap.add_argument("--probe-timeout", type=int, default=2400)
    args = ap.parse_args()

    spent = 0
    for problem, op, dtype, seed in CELLS:
        while spent < args.max_probes:
            probes = cell_probes(banked(), problem, op, dtype)
            b = next_batch(probes, seed)
            if b is None:
                print(f"[done] {problem}/{op}/{dtype}: {probes}", flush=True)
                break
            if not tunnel_up():
                print("tunnel never came back; stopping ladder", flush=True)
                return
            print(f"[probe] {problem}/{op}/{dtype} B={b}", flush=True)
            t0 = time.time()
            r = run_probe(problem, op, dtype, b, args.probe_timeout + 120)
            spent += 1
            if r is not None:
                print(r.stdout[-800:], flush=True)
            if r is None or r.returncode != 0:
                key = f"{problem}/{op}/{dtype}/B={b}"
                if key in banked():
                    continue  # verdict was banked before the crash
                if r is not None:
                    print(
                        f"[error] rc={r.returncode} after "
                        f"{time.time()-t0:.0f}s: {r.stderr[-1500:]}",
                        flush=True,
                    )
                # non-OOM failure (tunnel death mid-run, timeout, etc.) —
                # one retry after a tunnel health check, then give up on
                # this cell (never on the whole ladder)
                if not tunnel_up():
                    return
                r2 = run_probe(problem, op, dtype, b, args.probe_timeout + 120)
                spent += 1
                failed = r2 is None or r2.returncode != 0
                if failed and f"{problem}/{op}/{dtype}/B={b}" not in banked():
                    tail = r2.stderr[-800:] if r2 is not None else "(timeout)"
                    print(f"[skip cell] {problem}/{op}/{dtype}: {tail}",
                          flush=True)
                    break
    print("ladder complete", flush=True)


if __name__ == "__main__":
    main()
