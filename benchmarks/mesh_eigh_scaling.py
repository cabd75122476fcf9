"""Mesh-distributed eigendecomposition scaling for the eigh-bound builds.

Exact-damped KFAC inversion and EKFAC builds are eigh-bound (RESULTS.md):
XLA's single-chip eigh is already the fastest single-chip option
(micro_eigh.py), so the remaining lever is distributing the independent
per-factor decompositions across a mesh (`kfac/chain.py::batched_eigh
(mesh=...)`). Real multi-chip hardware is not available in this build
environment, so this measures RELATIVE scaling on a virtual CPU mesh
(1/2/4/8 devices, honestly labeled): each factor in a shape batch is an
independent ``syevd``, so the mesh parallelism pattern — shard the stack
axis, one local batch per device, no collectives until the (tiny) gather —
is identical on an ICI-connected TPU pod slice.

Usage::

    python benchmarks/mesh_eigh_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from curvlinops_tpu.kfac.chain import batched_eigh  # noqa: E402
from curvlinops_tpu.parallel.mesh import make_mesh  # noqa: E402


def factor_stacks(key) -> dict:
    """The 124M-GPT KFAC factor shape profile (12 blocks per shape)."""
    out = {}
    for name, (L, n) in {
        "attn_in": (12, 769),
        "attn_out": (12, 2304),
        "mlp_in": (12, 3072),
    }.items():
        k = jax.random.fold_in(key, hash(name) % 2**31)
        A = jax.random.normal(k, (L, n, n), jnp.float32) / n**0.5
        out[name] = A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(n)
    return out


def timed(fn, reps: int = 2) -> float:
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}",
          file=sys.stderr)
    mats = factor_stacks(jax.random.key(0))
    results = {"device": "virtual CPU mesh (relative scaling only)"}

    base = timed(lambda: batched_eigh(mats))
    results["mesh=1 (no mesh) s"] = round(base, 2)
    print(f"no mesh: {base:.2f} s", file=sys.stderr)
    for n_dev in (2, 4, 8):
        mesh = make_mesh(n_dev, ("data",), (n_dev,))
        t = timed(lambda: batched_eigh(mats, mesh=mesh))
        results[f"mesh={n_dev} s"] = round(t, 2)
        results[f"mesh={n_dev} speedup"] = round(base / t, 2)
        print(f"mesh={n_dev}: {t:.2f} s  ({base / t:.2f}x)", file=sys.stderr)

    out = Path(__file__).parent / "results" / "mesh_eigh_scaling.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
