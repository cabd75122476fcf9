"""Benchmarks for the estimation/solver/spectral layer (BASELINE.json configs).

The reference publishes no numbers for these (its docs run them as
tutorials), but the rebuild's north-star config list names them: CG/Neumann
inverses, Hutchinson/Hutch++/XTrace/XDiag trace-diagonal estimation, Lanczos
spectral density, and top-k eigenpairs — all on the ResNet-18/CIFAR-10 GGN,
entirely on device. Wall times are one-shot with host-readback barriers
(min over ``reps``), dominated by seconds of device work.

Usage::

    python benchmarks/run_estimators.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
import numpy as np


def _barrier(out) -> None:
    """Reduce EVERY array leaf into one device scalar, then ONE readback.

    Per-leaf readbacks serialize ~30 ms round trips each on this tunnel
    (n_leaves x 30 ms overcounts a multi-leaf result by seconds);
    ``block_until_ready`` has under-waited (CLAUDE.md)."""
    total = None
    for leaf in jax.tree.leaves(out):
        if isinstance(leaf, jax.Array):
            s = jnp.sum(jnp.abs(leaf.reshape(-1)[-1])).astype(jnp.float32)
            total = s if total is None else total + s
    if total is not None:
        float(total)


def timed(fn, reps: int = 2) -> tuple[float, object]:
    out = fn()
    _barrier(out)  # warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _barrier(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    import curvlinops_tpu as cl
    from curvlinops_tpu.models import cifar10_resnet18

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    prob = cifar10_resnet18(batch_size=512)
    # chunk the column vmap: 64 simultaneous VJP columns would multiply the
    # B=512 activation residency past HBM
    G = cl.GGNLinearOperator(
        prob.model_fn, prob.loss_fn, prob.params, prob.data,
        check_deterministic=False, max_vmap_columns=8,
    )
    damped = G + 1e-3 * cl.IdentityLinearOperator(G.in_spec)
    key = jax.random.key(0)
    results = {
        "problem": "cifar10_resnet18 GGN (B=512)",
        "device": str(jax.devices()[0]),
        "num_matvecs": 64,
        "num_matvecs_hutchpp": 63,  # divisible by 3 (sketch/probe split)
    }

    t, tr = timed(lambda: cl.hutchinson_trace(G, 64, key=key))
    results["hutchinson_trace (s)"] = round(t, 3)
    t, tr2 = timed(lambda: cl.hutchpp_trace(G, 63, key=key))
    results["hutchpp_trace (s)"] = round(t, 3)
    t, tr3 = timed(lambda: cl.xtrace(G, 64, key=key))
    results["xtrace (s)"] = round(t, 3)
    print(f"traces: hutch {float(tr):.1f}  hutch++ {float(tr2):.1f}  "
          f"xtrace {float(tr3):.1f}", file=sys.stderr)

    t, _ = timed(lambda: cl.hutchinson_diag(G, 64, key=key))
    results["hutchinson_diag (s)"] = round(t, 3)
    t, _ = timed(lambda: cl.xdiag(G, 64, key=key))
    results["xdiag (s)"] = round(t, 3)
    t, _ = timed(lambda: cl.hutchinson_squared_fro(G, 64, key=key))
    results["hutchinson_squared_fro (s)"] = round(t, 3)

    t, (grid, dens) = timed(lambda: cl.lanczos_approximate_spectrum(
        damped, ncv=64, num_points=512, num_repeats=2, key=key))
    results["lanczos_spectrum ncv=64 x2 (s)"] = round(t, 3)
    t, ld = timed(lambda: cl.slq_logdet(damped, ncv=64, num_repeats=8,
                                        key=key))
    results["slq_logdet ncv=64 x8 (s)"] = round(t, 3)
    print(f"slq_logdet: {float(ld):.1f}", file=sys.stderr)
    t, (w, _) = timed(lambda: cl.topk_eigenpairs(damped, k=5, maxiter=50,
                                                 key=key))
    results["topk_eigenpairs k=5 (s)"] = round(t, 3)
    print(f"top-5 eigs: {np.asarray(w).round(3)}", file=sys.stderr)

    grad, _ = G.gradient_and_loss()
    cg = cl.CGInverseLinearOperator(damped, maxiter=100, tol=1e-6)
    t, ng = timed(lambda: cg @ grad)
    results["cg_inverse_matvec maxiter=100 (s)"] = round(t, 3)
    mr = cl.MINRESInverseLinearOperator(damped, maxiter=100, tol=1e-6)
    t, _ = timed(lambda: mr @ grad)
    results["minres_inverse_matvec maxiter=100 (s)"] = round(t, 3)
    # Neumann needs scale < 2/lambda_max (~2e3 here, from the top-k run)
    scale = float(1.8 / jnp.max(w))
    neu = cl.NeumannInverseLinearOperator(damped, num_terms=100, scale=scale)
    t, _ = timed(lambda: neu @ grad)
    results["neumann_inverse_matvec 100 terms (s)"] = round(t, 3)

    out = Path(__file__).parent / "results" / "estimators_resnet18.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
