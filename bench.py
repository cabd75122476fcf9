"""Headline benchmark: GGN-VP matvec throughput on ResNet-18 / CIFAR-10.

Measures the device-side time of one GGN-vector product over a batch of 512
CIFAR-sized inputs (the reference's ``synthetic_cifar10_resnet18`` problem;
A6000 baseline: 34.0 ms eager / 16.0 ms torch.compile'd per matvec,
``BASELINE.md``). The matvec is iterated inside ONE jitted ``fori_loop`` with
a data dependency between iterations, so the number excludes host dispatch
and tunnel latency but cannot pipeline-cheat.

Prints exactly one JSON line:
``{"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}``
(``vs_baseline`` = speedup over the compiled reference, >1 is faster).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

REPEATS = 20
BASELINE_COMPILED_MS = 16.0  # RTX A6000, torch.compile (BASELINE.md)


def main() -> None:
    from curvlinops_tpu.curvature.ggn import make_batch_ggn_matmat
    from curvlinops_tpu.models import cifar10_resnet18

    print(f"benchmark device: {jax.devices()[0]}", file=sys.stderr)

    prob = cifar10_resnet18(batch_size=512)
    X, y = prob.data[0]
    kernel = make_batch_ggn_matmat(prob.model_fn, prob.loss_fn)

    key = jax.random.key(0)
    M = jax.tree.map(
        lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), prob.params
    )
    c = jnp.float32(1.0)

    @jax.jit
    def matvec_chain(params, X, y, M):
        def body(_, m):
            return kernel(params, X, y, m, c, key)

        return jax.lax.fori_loop(0, REPEATS, body, M)

    # warm up (compile)
    t0 = time.perf_counter()
    out = matvec_chain(prob.params, X, y, M)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    # timed runs
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = matvec_chain(prob.params, X, y, M)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPEATS)

    ms = best * 1e3
    print(
        json.dumps(
            {
                "metric": "GGN-VP matvec, ResNet-18/CIFAR-10 (B=512)",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_COMPILED_MS / ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
