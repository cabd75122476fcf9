"""Measured overhead of the mesh-distributed eigh program (not a projection).

`mesh_eigh_scaling.py` projects multi-device wall clock from a SERIAL
per-matrix baseline. This script instead RUNS the actual distributed
program — `batched_eigh(mats, mesh=8-device virtual CPU mesh)` — on the
124M-GPT factor-shape profile and measures it end to end.

What a 1-core host can and cannot establish (``nproc`` = 1):

- It CANNOT show parallel wall-clock speedup: the 8 virtual devices
  timeshare one core, so all shards serialize and wall(distributed) can
  never beat wall(serial). Any "speedup" printed from such a run would be
  scheduler noise (and early attempts produced 0.4x-2.7x garbage).
- It CAN measure the distributed program's TOTAL work and overhead:
  on one core, wall(distributed) = sum over shards of shard work
  + distribution overhead (padding eighs, gather, GSPMD bookkeeping).
  So ``overhead = wall(distributed) - wall(serial)`` is a direct
  measurement of everything the mesh path adds beyond the decompositions
  themselves.

On n real devices the equal-shape shards (stack padded to a multiple of n,
identical [ceil/n, D, D] local stacks — checked below) run concurrently, so

    wall_n  =  wall(compute-only distributed, 1 core) / n  +  gather/ICI,

where the compute-only wall is the sharded-eigh work of the real mesh
program (padding eighs + GSPMD bookkeeping included) without the
gather-to-replicated, which on one core serializes through host memcpy
but on hardware is a ~20 ms ICI transfer (charged separately). This
replaces the serial-baseline projection with one derived from the measured
distributed program itself.

Usage::

    python benchmarks/mesh_eigh_measured.py [--repeats 2]
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
from curvlinops_tpu.kfac.chain import batched_eigh  # noqa: E402
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
    args = ap.parse_args()

    assert len(jax.devices()) == N_DEV, jax.devices()
    mesh = make_mesh(N_DEV, ("data",), (N_DEV,))
    mats = factor_stacks(jax.random.key(0))

    results: dict = {"host_cores": os.cpu_count(), "n_devices": N_DEV}

    # serial reference: the exact same API without a mesh (per-shape
    # batched eigh, one device)
    serial_fn = jax.jit(lambda ms: {k: jnp.linalg.eigh(m) for k, m in ms.items()})
    jax.block_until_ready(serial_fn(mats))  # compile
    t_serial = _timed(lambda: serial_fn(mats), args.repeats)
    results["serial wall (s)"] = round(t_serial, 2)

    # distributed: pad each 12-stack to 16, shard over 8 devices, gather.
    # First call compiles; timed calls measure execution only.
    def run_dist():
        out = batched_eigh(mats, mesh=mesh)
        return jax.tree.leaves(out)

    jax.block_until_ready(run_dist())
    t_dist = _timed(run_dist, args.repeats)
    results["distributed wall, 1 core (s)"] = round(t_dist, 2)

    # compute-only wall: the identical padded sharded eigh programs WITHOUT
    # the in-program slice+gather-to-replicated. On 1 core the gather is 8
    # serialized replica copies (~5 GiB of memcpy — an artifact of
    # timesharing); on hardware the same gather rides ICI at ~45 GB/s, so
    # the derived formula charges compute/n + gather-at-ICI instead.
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec("data"))
    compute_fns = {}
    padded = {}
    for k, m in mats.items():
        D = m.shape[-1]
        flat = m.reshape(-1, D, D)
        pad = (-flat.shape[0]) % N_DEV
        eye = jnp.broadcast_to(jnp.eye(D, dtype=flat.dtype), (pad, D, D))
        padded[k] = jax.device_put(
            jnp.concatenate([flat, eye]), sharding
        )
        compute_fns[k] = jax.jit(jnp.linalg.eigh, in_shardings=sharding)
        jax.block_until_ready(compute_fns[k](padded[k]))
    t_comp = _timed(
        lambda: [compute_fns[k](padded[k]) for k in mats], args.repeats
    )
    results["distributed compute-only wall, 1 core (s)"] = round(t_comp, 2)

    # the distributed stacks pad 12 -> 16 per shape (identity matrices),
    # so the 1-core wall includes 3 shapes x 4 padding eighs of extra work;
    # shards are exactly equal ([2, D, D] per device per shape)
    pad_matrices = sum((-m.shape[0]) % N_DEV for m in mats.values())
    results["padding eighs included"] = pad_matrices
    # compute overhead (what the derived walls charge): padding + GSPMD
    results["compute overhead vs serial (s)"] = round(t_comp - t_serial, 2)
    results["compute overhead fraction"] = round(t_comp / t_serial - 1, 3)
    # full-wall overhead additionally contains the 1-core gather memcpy
    # artifact; reported for transparency, not used in the derivation
    results["full-wall overhead vs serial (s)"] = round(t_dist - t_serial, 2)

    gather_bytes = sum(
        4 * (m.shape[0] + (-m.shape[0]) % N_DEV) * m.shape[-1] * (m.shape[-1] + 1)
        for m in mats.values()
    )
    results["gather (MB)"] = round(gather_bytes / 2**20, 1)
    # v5e ICI ~45 GB/s per link: the result gather is milliseconds
    results["gather at 45 GB/s (ms)"] = round(gather_bytes / 45e9 * 1e3, 1)

    # derived from the MEASURED distributed program: equal shards =>
    # n-device wall = (1-core compute wall)/n + gather over ICI
    for n in (2, 4, 8):
        wall_n = t_comp / n + gather_bytes / 45e9
        results[f"derived wall on {n} devices (s)"] = round(wall_n, 2)
        results[f"derived speedup on {n} devices"] = round(t_serial / wall_n, 2)

    results["note"] = (
        "1 core => shards serialize: the compute-only wall measures the "
        "TOTAL sharded-eigh work of the real mesh program (incl. padding "
        "and GSPMD overhead); n-device wall = that total / n + the result "
        "gather at ICI bandwidth. The full batched_eigh 1-core wall "
        "additionally serializes the 8-replica gather through host memcpy, "
        "which hardware does not."
    )

    out = Path(__file__).parent / "results" / "mesh_eigh_measured.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
