"""Measured overhead of the mesh-distributed rank-r randomized build.

``mesh_eigh_measured.py`` established the methodology for the exact-eigh
phase: on a 1-core host the 8 virtual devices timeshare, so the distributed
program's wall measures its TOTAL work, and

    wall_n = wall(compute-only distributed, 1 core) / n + gather at ICI.

This script applies the same method to the production-relevant build —
``batched_randomized_eigh`` at rank r (the ``inverse(rank=)`` / ``EKFAC
(rank=)`` path).  The rank-r build is MATMUL-bound (range finder + core
formation; the only eigh left is ``[*, r, r]``), so it should scale better
across chips than eigh — no sequential panel factorization, and the gather
moves ``D x r`` bases instead of ``D x D`` eigenvector matrices.

Outputs one table superseding the eigh-only ledger: serial exact eigh,
serial rank-r, distributed rank-r compute-only wall, and derived n-device
walls for both phases side by side.

Usage::

    python benchmarks/mesh_rankr_measured.py [--repeats 2] [--rank 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402

from benchmarks.mesh_eigh_scaling import factor_stacks  # noqa: E402
from curvlinops_tpu.kfac.randomized import (  # noqa: E402
    batched_randomized_eigh,
)
from curvlinops_tpu.parallel.mesh import make_mesh  # noqa: E402

N_DEV = 8


def _timed(fn, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--rank", type=int, default=512)
    args = ap.parse_args()

    assert len(jax.devices()) == N_DEV, jax.devices()
    mesh = make_mesh(N_DEV, ("data",), (N_DEV,))
    mats = factor_stacks(jax.random.key(0))
    key = jax.random.key(1)

    results: dict = {
        "host_cores": os.cpu_count(),
        "n_devices": N_DEV,
        "rank": args.rank,
    }

    # serial reference 1: exact eigh (the phase rank-r replaces)
    eigh_fn = jax.jit(
        lambda ms: {k: jnp.linalg.eigh(m) for k, m in ms.items()}
    )
    jax.block_until_ready(eigh_fn(mats))
    t_eigh = _timed(lambda: eigh_fn(mats), args.repeats)
    results["serial exact eigh wall (s)"] = round(t_eigh, 2)

    # serial reference 2: rank-r build, one device
    def run_serial():
        out = batched_randomized_eigh(mats, args.rank, key)
        return jax.tree.leaves(out)

    jax.block_until_ready(run_serial())
    t_serial = _timed(run_serial, args.repeats)
    results["serial rank-r wall (s)"] = round(t_serial, 2)

    # distributed rank-r: full wall (incl. the 1-core gather memcpy
    # artifact) and compute-only wall (sharded range+core programs without
    # the gather-to-replicated)
    def run_dist():
        out = batched_randomized_eigh(mats, args.rank, key, mesh=mesh)
        return jax.tree.leaves(out)

    jax.block_until_ready(run_dist())
    t_dist = _timed(run_dist, args.repeats)
    results["distributed wall, 1 core (s)"] = round(t_dist, 2)

    from jax.sharding import NamedSharding, PartitionSpec

    from curvlinops_tpu.kfac.randomized import _range_core

    sharding = NamedSharding(mesh, PartitionSpec("data"))
    compute_fns, sharded_in = {}, {}
    for k, m in mats.items():
        D = m.shape[-1]
        flat = m.reshape(-1, D, D)
        pad = (-flat.shape[0]) % N_DEV
        if pad:
            eye = jnp.broadcast_to(jnp.eye(D, dtype=flat.dtype), (pad, D, D))
            flat = jnp.concatenate([flat, eye])
        omega = jax.random.normal(key, (flat.shape[0], D, args.rank))
        sharded_in[k] = (
            jax.device_put(flat, sharding),
            jax.device_put(omega, sharding),
        )
        compute_fns[k] = jax.jit(
            lambda s, o: _range_core(s, o, 1),
            in_shardings=(sharding, sharding),
            out_shardings=sharding,
        )
        jax.block_until_ready(compute_fns[k](*sharded_in[k]))
    t_comp = _timed(
        lambda: [compute_fns[k](*sharded_in[k]) for k in mats], args.repeats
    )
    results["distributed range+core wall, 1 core (s)"] = round(t_comp, 2)

    # the SERIAL range+core portion, so the sharded fraction is compared
    # like-for-like and the unsharded remainder (core eigh + U assembly)
    # can be charged at full cost in the derived walls
    serial_rc = {}
    for k, m in mats.items():
        D = m.shape[-1]
        flat = m.reshape(-1, D, D)
        omega = jax.random.normal(key, (flat.shape[0], D, args.rank))
        fn = jax.jit(lambda s, o: _range_core(s, o, 1))
        jax.block_until_ready(fn(flat, omega))
        serial_rc[k] = (fn, flat, omega)
    t_serial_rc = _timed(
        lambda: [fn(f, o) for fn, f, o in serial_rc.values()], args.repeats
    )
    results["serial range+core wall (s)"] = round(t_serial_rc, 2)
    t_rest = max(t_serial - t_serial_rc, 0.0)
    results["unsharded remainder: core eigh + U assembly (s)"] = round(
        t_rest, 2
    )
    results["sharded-portion overhead vs serial (s)"] = round(
        t_comp - t_serial_rc, 2
    )
    results["sharded-portion overhead fraction"] = round(
        t_comp / t_serial_rc - 1, 3
    )

    # gather: per factor a [b, D, r] basis + [b, r, r] core + [b] trace
    gather_bytes = sum(
        4
        * (m.shape[0] + (-m.shape[0]) % N_DEV)
        * (m.shape[-1] * args.rank + args.rank**2 + 1)
        for m in mats.values()
    )
    results["gather (MB)"] = round(gather_bytes / 2**20, 1)
    results["gather at 45 GB/s (ms)"] = round(gather_bytes / 45e9 * 1e3, 1)

    for n in (2, 4, 8):
        # conservative: the core-eigh + U-assembly remainder is charged
        # UNSHARDED even though the real mesh program shards the core eigh
        wall_n = t_comp / n + t_rest + gather_bytes / 45e9
        results[f"derived rank-r wall on {n} devices (s)"] = round(wall_n, 2)
        results[f"derived speedup vs serial exact eigh ({n} dev)"] = round(
            t_eigh / wall_n, 2
        )

    results["note"] = (
        "Same 1-core methodology as mesh_eigh_measured.py: shards "
        "serialize on one core, so the sharded range+core wall is its "
        "TOTAL work; n-device wall = that total/n + the unsharded "
        "remainder (core eigh + U assembly, charged at full cost) + the "
        "basis gather at ICI. The rank-r build is matmul-bound, so these "
        "derived speedups supersede the eigh-only ledger for the "
        "production inverse/EKFAC path."
    )

    out = Path(__file__).parent / "results" / "mesh_rankr_measured.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
