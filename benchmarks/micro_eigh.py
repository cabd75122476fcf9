"""Microbenchmark: symmetric eigendecomposition at KFAC factor shapes.

Exact-damped inversion and EKFAC builds are eigh-bound on TPU (24 s / 22 s
for the 124M GPT, RESULTS.md). XLA's TPU eigh is a QDWH spectral
divide-and-conquer with a Jacobi base case; both the implementation and the
internal matmul precision are selectable. This measures each option on the
GPT-2 factor stacks, with the decomposition residual
``||A V - V diag(w)||_F / ||A||_F`` so speed never silently costs accuracy.

Usage::

    python benchmarks/micro_eigh.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
from jax._src.lax import linalg as lax_linalg
from jax._src.tpu.linalg import eigh as tpu_eigh


def timed(fn, *args, reps: int = 3) -> tuple[float, tuple]:
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0][..., -1]))
        best = min(best, time.perf_counter() - t0)
    return best, out


@jax.jit
def residual(A, w, V):
    r = jnp.linalg.norm(A @ V - V * w[..., None, :], axis=(-2, -1))
    return jnp.max(r / jnp.linalg.norm(A, axis=(-2, -1)))


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.key(0)

    def lax_impl(impl):
        def f(a):
            V, w = lax_linalg.eigh(
                a, lower=True, symmetrize_input=False, implementation=impl
            )
            return w, V

        return jax.vmap(f)

    def qdwh_tuned(precision, termination_size):
        f = partial(
            tpu_eigh.eigh,
            precision=precision,
            termination_size=termination_size,
            sort_eigenvalues=False,
        )
        return jax.vmap(f)

    variants = {
        "default jnp.linalg.eigh": lambda a: jnp.linalg.eigh(a),
        "jacobi": lax_impl(lax_linalg.EighImplementation.JACOBI),
        "qdwh (explicit)": lax_impl(lax_linalg.EighImplementation.QDWH),
        "qdwh prec=high": qdwh_tuned("high", 256),
        "qdwh prec=bf16": qdwh_tuned("bfloat16", 256),
        "qdwh term=1024": qdwh_tuned("float32", 1024),
        "qdwh high+1024": qdwh_tuned("high", 1024),
    }

    shapes = [(12, 769), (12, 2304), (12, 3072)]
    for L, n in shapes:
        k = jax.random.fold_in(key, L * 100000 + n)
        A = jax.random.normal(k, (L, n, n), jnp.float32) / n**0.5
        A = A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(n)  # SPD

        for name, fn in variants.items():
            try:
                t, out = timed(fn, A)
            except Exception as e:  # noqa: BLE001
                print(f"[{L:3d},{n:5d}] {name:24s}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            w, V = (out if len(out) == 2 else out[:2])
            if w.ndim == 3:  # some impls return (V, w)
                w, V = V, w
            res = float(residual(A, w, V))
            print(f"[{L:3d},{n:5d}] {name:24s}: {t:7.3f} s   resid {res:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
