"""A/B microbenchmark: lowerings of the stacked Kronecker eigenbasis matvec.

The scan-stacked KFAC/EKFAC inverse matvec is bound by
``StackedEighOperator._matmat`` — two ``stacked_kron_matmat`` calls per block
group (``Q^T``, scale, ``Q``).  RESULTS.md records the stacked form ~1.7x
slower than the unrolled per-layer chain on the 124M GPT.  This script times
candidate lowerings on the real device at the exact GPT-2 group shapes:

  A  current: grid-order operand, one ``moveaxis`` relayout per factor
  B  K-leading: operand ``[L, K, g1..gk]``, always contract axis 2, factor as
     rhs — grid axes cycle to the back naturally, zero per-factor relayouts
  C  unrolled: python loop over the L slices (what the unrolled chain does)

Usage::

    python benchmarks/micro_stacked_matvec.py
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


def kron_matmat_A(factors, M):
    """Current lowering (ops/stacked.py::stacked_kron_matmat)."""
    L, K = factors[0].shape[0], M.shape[-1]
    grid = tuple(S.shape[2] for S in factors)
    x = M.reshape(L, *grid, K)
    for i, S in enumerate(factors):
        x = jax.lax.dot_general(S, x, (((2,), (i + 1,)), ((0,), (0,))))
        x = jnp.moveaxis(x, 1, i + 1)
    return x.reshape(-1, K)


def kron_matmat_B(factors, M):
    """K-leading lowering: contract axis 2 every step, no per-factor moves."""
    L, K = factors[0].shape[0], M.shape[-1]
    grid = tuple(S.shape[2] for S in factors)
    x = jnp.moveaxis(M.reshape(L, *grid, K), -1, 1)  # [L, K, g1..gk]
    for S in factors:
        # out[l, K, g2.., m] = sum_g x[l, K, g, g2..] S[l, m, g]
        x = jax.lax.dot_general(x, S, (((2,), (2,)), ((0,), (0,))))
    return jnp.moveaxis(x, 1, -1).reshape(-1, K)


def kron_matmat_C(factors, M):
    """Unrolled python loop over stack slices (the reference chain's shape)."""
    L, K = factors[0].shape[0], M.shape[-1]
    grid = tuple(S.shape[2] for S in factors)
    outs = []
    x_all = M.reshape(L, *grid, K)
    for l in range(L):
        x = x_all[l]
        for i, S in enumerate(factors):
            x = jnp.tensordot(S[l], x, axes=((1,), (i,)))
            x = jnp.moveaxis(x, 0, i)
        outs.append(x[None])
    return jnp.concatenate(outs, 0).reshape(-1, K)


def eigh_matvec(kron_matmat, Qs, lam, M):
    QT = [jnp.swapaxes(Q, -1, -2) for Q in Qs]
    W = kron_matmat(QT, M)
    W = lam.reshape(-1)[:, None] * W
    return kron_matmat(Qs, W)


def timed_chain(fn, init, *args) -> float:
    fn = jax.jit(fn)
    out = fn(init, *args)
    jax.block_until_ready(out)

    def run_chain(n: int) -> float:
        t0 = time.perf_counter()
        o = init
        for _ in range(n):
            o = fn(o, *args)
        float(jnp.sum(o))
        return time.perf_counter() - t0

    run_chain(3)
    n1, n2 = 8, 40
    best = float("inf")
    for _ in range(3):
        t1, t2 = run_chain(n1), run_chain(n2)
        best = min(best, (t2 - t1) / (n2 - n1))
    return max(best, 0.0) * 1e3


def main() -> None:
    print(f"devices: {jax.devices()}")
    key = jax.random.key(0)
    # GPT-2 124M scan-stacked block groups: (Dg, Da) with joint W+b columns
    groups = {
        "qkv": (2304, 769),
        "attn_proj": (768, 769),
        "mlp_fc": (3072, 769),
        "mlp_proj": (768, 3073),
    }
    L = 12
    for gi, (name, (dg, da)) in enumerate(groups.items()):
        kg, ka, kl, km = jax.random.split(jax.random.fold_in(key, gi), 4)
        Qg = jax.random.normal(kg, (L, dg, dg), jnp.float32) / dg**0.5
        Qa = jax.random.normal(ka, (L, da, da), jnp.float32) / da**0.5
        lam = jnp.abs(jax.random.normal(kl, (L, dg * da), jnp.float32)) + 0.1
        M = jax.random.normal(km, (L * dg * da, 1), jnp.float32)
        for tag, km_fn in (("A", kron_matmat_A), ("B", kron_matmat_B), ("C", kron_matmat_C)):
            ms = timed_chain(
                lambda m, qg, qa, lm, km_fn=km_fn: eigh_matvec(
                    km_fn, [qg, qa], lm, m
                ),
                M,
                Qg,
                Qa,
                lam,
            )
            print(f"{name:10s} [{L},{dg},{da}] variant {tag}: {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
