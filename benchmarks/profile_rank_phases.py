"""Phase breakdown of ``kfac.inverse(rank=r)`` on the real 124M-GPT factors.

The micro kernel (``micro_randomized_inverse.py``) builds rank-128 partial
eigenbases of GPT-shaped factors in ~0.1 s, yet the operator-level build
banks ~9 s — this script times each phase of the SECOND (warm) build to
find where the difference lives: batched_eigh of the non-lr leftovers,
``batched_randomized_eigh``, the jitted assembly program, chain
construction (Python), and the final readback.

Usage (TPU): ``python benchmarks/profile_rank_phases.py [--rank 128]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--problem", default="shakespeare_nanogpt")
    args = ap.parse_args()

    from curvlinops_tpu.models import PROBLEMS
    from curvlinops_tpu import KFACLinearOperator

    prob = PROBLEMS["synthetic_" + args.problem]()
    kfac = KFACLinearOperator(
        prob.kfac_model_fn, prob.loss_fn, prob.kfac_params, prob.data,
        fisher_type="mc", mc_samples=1, check_deterministic=False,
    )

    import curvlinops_tpu.kfac.operator as op_mod
    import curvlinops_tpu.kfac.chain as chain_mod
    import curvlinops_tpu.kfac.randomized as rand_mod

    phases: dict[str, float] = {}

    def _barrier(out) -> None:
        # NOT block_until_ready: it has returned early on this runtime
        # (this very script measured a 10.5 s build as 0.17 s with it) —
        # reduce all leaves to one scalar and read it back
        s = sum(
            jnp.sum(jnp.ravel(leaf)[-1:].astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
            if hasattr(leaf, "dtype")
        )
        float(s)

    def wrap(mod, name, fn):
        def timed(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            _barrier(out)
            phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
            return out

        setattr(mod, name, timed)
        return fn

    def _barrier0(out) -> None:
        s = sum(
            jnp.sum(jnp.ravel(leaf)[-1:].astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
            if hasattr(leaf, "dtype")
        )
        float(s)

    # warm build (compiles)
    inv = kfac.inverse(damping=1e-3, use_exact_damping=True, rank=args.rank)
    _barrier0(inv._blocks_data)

    orig_eigh = op_mod.batched_eigh
    orig_reig = rand_mod.batched_randomized_eigh
    orig_asm = op_mod._damped_eig_assembly_program
    wrap(op_mod, "batched_eigh", orig_eigh)
    # inverse() imports this lazily from the module each call
    wrap(rand_mod, "batched_randomized_eigh", orig_reig)
    wrap(op_mod, "_damped_eig_assembly_program", orig_asm)

    t0 = time.perf_counter()
    inv = kfac.inverse(damping=1e-3, use_exact_damping=True, rank=args.rank)
    t_build_nosync = time.perf_counter() - t0
    _barrier0(inv._blocks_data)
    total = time.perf_counter() - t0
    phases["total (with final sync)"] = total
    phases["inverse() python return (pre-sync)"] = t_build_nosync

    # un-patch
    op_mod.batched_eigh = orig_eigh
    rand_mod.batched_randomized_eigh = orig_reig
    op_mod._damped_eig_assembly_program = orig_asm

    out = {k: round(v, 4) for k, v in phases.items()}
    out["rank"] = args.rank
    out["problem"] = args.problem
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=2))
    path = Path(__file__).parent / "results" / "rank_phase_profile.json"
    path.write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
