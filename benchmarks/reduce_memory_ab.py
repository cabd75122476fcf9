"""A/B: REDUCE-mode KFAC factor-kernel memory, averaged vs materialized.

REDUCE only needs the per-sample mean over conv output locations of the
unfolded input; `kfac/math.py::extract_averaged_patches` computes it from
strided input slices without ever writing the `[B, S, C*K^2]` patch tensor
to HBM (the reference's no-materialization contraction,
`kfac_utils.py:124-180`). This compiles the ResNet-50 KFAC factor kernel
both ways and reports XLA's compile-time memory analysis (deterministic;
the tunnel backend exposes no runtime memory_stats) plus KFAC exactness of
the factors across the two paths.

Usage::

    python benchmarks/reduce_memory_ab.py [--problem imagenet_resnet50]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def kernel_memory(prob, kfac_approx: str) -> tuple[dict, tuple]:
    """Compile the per-batch KFAC factor kernel; return memory analysis."""
    from curvlinops_tpu.kfac import math as kmath
    from curvlinops_tpu.kfac.computer import KFACComputer

    computer = KFACComputer(
        prob.kfac_model_fn,
        prob.loss_fn,
        prob.kfac_params,
        prob.data,
        fisher_type="mc",
        mc_samples=1,
        kfac_approx=kfac_approx,
        check_deterministic=False,
    )
    X, y = prob.data[0]
    traced = computer._get_traced(X)
    kernel = jax.jit(computer._make_batch_kernel(traced))
    corr = jnp.float32(
        kmath.loss_correction(
            computer.batch_size_fn(X),
            computer.num_per_example_loss_terms,
            prob.loss_fn.reduction,
            computer.num_data,
        )
    )
    args = (computer.frozen, prob.kfac_params, X, y, jax.random.key(0), corr)
    compiled = kernel.lower(*args).compile()
    mem = compiled.memory_analysis()
    stats = {
        "temp (GiB)": round(mem.temp_size_in_bytes / 2**30, 3),
        "argument (GiB)": round(mem.argument_size_in_bytes / 2**30, 3),
        "output (GiB)": round(mem.output_size_in_bytes / 2**30, 3),
    }
    out = compiled(*args)
    jax.block_until_ready(out)
    return stats, out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--problem", default="imagenet_resnet50")
    parser.add_argument("--batch-size", type=int, default=None)
    args = parser.parse_args()

    from curvlinops_tpu.kfac import math as kmath
    from curvlinops_tpu.models import PROBLEMS

    kwargs = {}
    if args.batch_size:
        kwargs["batch_size"] = args.batch_size
    prob = PROBLEMS["synthetic_" + args.problem](**kwargs)
    print(f"problem={prob.name} device={jax.devices()[0]}", file=sys.stderr)

    results = {"problem": prob.name, "device": str(jax.devices()[0])}

    kmath.FORCE_MATERIALIZED_REDUCE = False
    stats_avg, out_avg = kernel_memory(prob, "reduce")
    results["reduce averaged-patch"] = stats_avg
    print(f"averaged:     {stats_avg}", file=sys.stderr)

    kmath.FORCE_MATERIALIZED_REDUCE = True
    try:
        stats_mat, out_mat = kernel_memory(prob, "reduce")
    finally:
        kmath.FORCE_MATERIALIZED_REDUCE = False
    results["reduce materialized"] = stats_mat
    print(f"materialized: {stats_mat}", file=sys.stderr)

    # the two paths must agree numerically (relative to factor magnitude —
    # TPU matmuls are bf16, and the two contraction orders round differently;
    # exact fp32 equality per conv config is tests/test_averaged_patches.py)
    max_diff = max_rel = 0.0
    for a, b in zip(jax.tree.leaves(out_avg), jax.tree.leaves(out_mat)):
        d = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(a)))
        max_diff = max(max_diff, d)
        if scale > 0:
            max_rel = max(max_rel, d / scale)
    results["max factor diff"] = max_diff
    results["max relative factor diff"] = max_rel
    print(
        f"max factor diff: {max_diff:.2e} (rel {max_rel:.2e})", file=sys.stderr
    )

    out = Path(__file__).parent / "results" / "reduce_memory_ab.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
