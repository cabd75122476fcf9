"""A/B: GGN-VP kernel forms at K=1 on the headline problem (fp32 + bf16).

Round 1 measured the headline GGN-VP at 1.139 ms with a fused jvp/vjp
kernel; rounds 2-3 measured 1.514/1.618 ms after `ff41186` switched to a
``jax.linearize`` + ``linear_transpose`` kernel whose stored residuals are
shared across matmat columns.  That sharing wins for multi-column matmats
(one linearized forward instead of one fused forward per column under
``vmap``), but at K=1 it trades recompute-with-locality for an HBM round
trip of every residual — a bad trade on a bandwidth-bound ResNet.

This measures both forms at K=1 with the loop-embedded marginal rate (the
bench.py methodology) so the headline's 1.139 -> 1.618 drift is attributed:
session noise vs kernel form.

Usage::

    python benchmarks/ggn_form_ab.py
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N1, N2 = 20, 100


def make_fused(model_fn, loss_fn):
    """Round-1 form: fused jvp + fresh vjp per application (recompute)."""

    def kern(params, X, y, v):
        def f(p):
            return model_fn(p, X)

        pred, jv = jax.jvp(f, (params,), (v,))
        loss_grad = jax.grad(lambda q: loss_fn(q, y))
        _, hjv = jax.jvp(loss_grad, (pred,), (jv,))
        _, vjp_fn = jax.vjp(f, params)
        return vjp_fn(hjv)[0]

    return kern


def make_linearized(model_fn, loss_fn):
    """Round-2+ form: linearize once, transpose the jvp (stored residuals)."""

    def kern(params, X, y, v):
        def f(p):
            return model_fn(p, X)

        pred, jvp_fn = jax.linearize(f, params)
        vjp_fn = jax.linear_transpose(jvp_fn, params)
        loss_grad = jax.grad(lambda q: loss_fn(q, y))
        jv = jvp_fn(v)
        _, hjv = jax.jvp(loss_grad, (pred,), (jv,))
        return vjp_fn(hjv)[0]

    return kern


def loop_rate_ms(kern, v, params, X, y) -> float:
    # ONE loop-timing harness repo-wide: run.py::_timed_loop (median over
    # repeats, resolution-floor escalation, non-negative clamp). A local
    # re-implementation here once lacked the clamp — the poisoned-sample
    # class this round eliminated.
    import run as _run

    _run.REPEATS_IN_LOOP = N2
    ms, _, _ = _run._timed_loop(
        lambda mm, p, XX, yy: kern(p, XX, yy, mm), v, params, X, y
    )
    return ms


def main() -> None:
    from curvlinops_tpu.models import cifar10_resnet18

    print(f"device: {jax.devices()[0]}", flush=True)
    results = {"device": str(jax.devices()[0])}
    for dtype in (jnp.float32, jnp.bfloat16):
        prob = cifar10_resnet18(batch_size=512, dtype=dtype)
        X, y = prob.data[0]
        v = jax.tree.map(lambda p: 0.01 * jnp.ones(p.shape, p.dtype),
                         prob.params)
        for name, maker in (
            ("fused jvp/vjp", make_fused),
            ("linearize+transpose", make_linearized),
        ):
            kern = maker(prob.model_fn, prob.loss_fn)
            ms = loop_rate_ms(kern, v, prob.params, X, y)
            results[f"{name} K=1 ({jnp.dtype(dtype).name}) ms"] = round(ms, 3)
            print(f"{name} [{jnp.dtype(dtype).name}]: {ms:.3f} ms", flush=True)

    out = Path(__file__).parent / "results" / "ggn_form_ab.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
