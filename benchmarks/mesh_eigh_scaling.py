"""Mesh-distributed eigendecomposition scaling for the eigh-bound builds.

Exact-damped KFAC inversion and EKFAC builds are eigh-bound (RESULTS.md):
XLA's single-chip eigh is already the fastest single-chip option
(micro_eigh.py), so the remaining lever is distributing the independent
per-factor decompositions across a mesh (`kfac/chain.py::batched_eigh
(mesh=...)`).

Measurement reality on this build host: real multi-chip hardware is not
available, and the host exposes ONE CPU core (``nproc`` = 1), so a virtual
8-device CPU mesh serializes — wall-clock "scaling" measured here would be
pure scheduler noise (verified: early runs produced 0.4x-2.7x garbage).
What CAN be established honestly:

1. the per-stack eigh baseline is SERIAL (process_time/wall ratio 1.0 —
   the batched LAPACK syevd custom call runs one matrix at a time), and
2. `batched_eigh(mesh=...)` shards the stack axis evenly (functional
   equality tests in tests/test_parallel.py; padding to a multiple of the
   axis size), with no cross-matrix dependencies and a gather of only
   [n, D] eigenvalues + [n, D, D] vectors at the end.

Each mesh device therefore executes ceil(n/n_dev) independent local eighs
back-to-back, giving the deterministic critical-path projection
``t_ndev = ceil(n/n_dev)/n * t_serial`` reported below — about as solid as
a projection gets for an embarrassingly parallel phase (ICI gather time for
the [12, 3072^2] result is ~100 MB / ~45 GB/s ~= 2-3 ms, noise).

Usage::

    python benchmarks/mesh_eigh_scaling.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def factor_stacks(key) -> dict:
    """The 124M-GPT KFAC factor shape profile (12 blocks per shape)."""
    out = {}
    for i, (name, (L, n)) in enumerate({
        "attn_in": (12, 769),
        "attn_out": (12, 2304),
        "mlp_in": (12, 3072),
    }.items()):
        # fold in the enumerate index, not hash(name): string hashing is
        # randomized per process, which made the generated data (and hence
        # the published timings) irreproducible across runs
        k = jax.random.fold_in(key, i)
        A = jax.random.normal(k, (L, n, n), jnp.float32) / n**0.5
        out[name] = A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(n)
    return out


def main() -> None:
    mats = factor_stacks(jax.random.key(0))
    results: dict = {"host_cores": os.cpu_count()}

    serial = {}
    for name, A in mats.items():
        f = jax.jit(jnp.linalg.eigh)
        jax.block_until_ready(f(A))  # compile
        best, cpu_ratio = float("inf"), 0.0
        for _ in range(2):
            t0, p0 = time.perf_counter(), time.process_time()
            jax.block_until_ready(f(A))
            t1, p1 = time.perf_counter(), time.process_time()
            if t1 - t0 < best:
                best, cpu_ratio = t1 - t0, (p1 - p0) / (t1 - t0)
        serial[name] = best
        results[f"serial {name} {tuple(A.shape)} (s)"] = round(best, 2)
        results[f"serial {name} cores used"] = round(cpu_ratio, 2)
        print(
            f"{name} {tuple(A.shape)}: {best:.2f} s serial "
            f"({cpu_ratio:.2f} cores used)",
            file=sys.stderr,
        )

    total = sum(serial.values())
    results["serial total (s)"] = round(total, 2)
    L = 12  # stack length per shape
    for n_dev in (2, 4, 8):
        local = math.ceil(L / n_dev)
        projected = total * local / L
        results[f"mesh={n_dev} projected (s)"] = round(projected, 2)
        results[f"mesh={n_dev} projected speedup"] = round(total / projected, 2)
        print(
            f"mesh={n_dev}: ceil({L}/{n_dev})={local} local eighs/device -> "
            f"{projected:.2f} s projected ({total / projected:.2f}x)",
            file=sys.stderr,
        )
    results["note"] = (
        "1-core build host: virtual-device wall clock is meaningless; "
        "projection = ceil(L/n)/L * serial (independent identical eighs, "
        "per-matrix serial baseline verified via process_time ratio)"
    )

    out = Path(__file__).parent / "results" / "mesh_eigh_scaling.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
