"""A/B: unbatched Kronecker matvec lowerings at ResNet-18 KFAC block shapes.

The K-leading order won ~10% on the GPT-2 chain (large blocks); ResNet-18's
chain is many SMALL blocks, where the entry/exit relayouts could dominate.
Variants:

  G  grid-order (tensordot + per-factor moveaxis) — the original lowering
  K  K-leading (entry/exit moveaxis, contract axis 1 each step)

Each timed as a chain over a representative set of ResNet-18 group shapes
(aaT [Din(+1)], ggT [Dout]), K=1 columns.

Usage: ``python benchmarks/micro_kron_matvec.py``
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp


def kron_G(factors, M):
    K = M.shape[-1]
    grid = tuple(S.shape[1] for S in factors)
    x = M.reshape(*grid, K)
    for i, S in enumerate(factors):
        x = jnp.moveaxis(jnp.tensordot(S, x, axes=[[1], [i]]), 0, i)
    return x.reshape(-1, K)


def kron_K(factors, M):
    K = M.shape[-1]
    grid = tuple(S.shape[1] for S in factors)
    x = jnp.moveaxis(M.reshape(*grid, K), -1, 0)
    for S in factors:
        x = jax.lax.dot_general(x, S, (((1,), (1,)), ((), ())))
    return jnp.moveaxis(x, 0, -1).reshape(-1, K)


# ResNet-18 KFAC group shapes (ggT dout, aaT din+1) — conv 3x3 layers
GROUPS = [
    (64, 577), (64, 577), (64, 577), (64, 577),
    (128, 577), (128, 1153), (128, 1153), (128, 65),
    (256, 1153), (256, 2305), (256, 2305), (256, 129),
    (512, 2305), (512, 4609), (512, 4609), (512, 257),
    (10, 513),
]


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.key(0)
    factors, vecs = [], []
    for i, (dout, din) in enumerate(GROUPS):
        kg, ka, kv = jax.random.split(jax.random.fold_in(key, i), 3)
        factors.append(
            (jax.random.normal(kg, (dout, dout)) / dout**0.5,
             jax.random.normal(ka, (din, din)) / din**0.5)
        )
        vecs.append(jax.random.normal(kv, (dout * din, 1)))

    for tag, fn in (("G", kron_G), ("K", kron_K)):
        def apply_all(vs, fs):
            return [fn([g, a], v) for v, (g, a) in zip(vs, fs)]

        jfn = jax.jit(apply_all)
        out = jfn(vecs, factors)
        jax.block_until_ready(out)

        def chain(n):
            t0 = time.perf_counter()
            o = vecs
            for _ in range(n):
                o = jfn(o, factors)
            float(jnp.sum(o[0]))
            return time.perf_counter() - t0

        chain(3)
        best = float("inf")
        for _ in range(3):
            t1, t2 = chain(8), chain(40)
            best = min(best, (t2 - t1) / 32)
        print(f"variant {tag}: {best*1e3:8.3f} ms per full-chain apply", flush=True)


if __name__ == "__main__":
    main()
