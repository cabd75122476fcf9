"""A/B: per-block Kronecker matvecs vs one zero-padded batched stack.

Small-layer chains (the mnist MLP: six dense blocks, largest factor 1025)
spend their KFAC matvec in per-op overhead, not FLOPs — the applied program
is ~18 tiny dots + converters (`kfac/chain.py`), measured 0.76 ms on the
v5e while the real Kronecker work is ~5 GFLOP ≈ 50 µs. Zero-padding every
block's factors to the chain-wide max and stacking them turns the whole
block-diagonal apply into TWO batched ``dot_general``s (the K-leading
contraction of ``kron_matmat``, batched over the layer axis). Padding is
exact: embedding A in the top-left of a zero matrix and the operand in the
matching slots leaves the real region equal to ``A X Gᵀ`` and the padded
region zero.

The padded stack does ~5× the real FLOPs here (26 vs 4.8 GFLOP) — the bet
was that on small chains overhead dominates FLOPs by far more than 5×.
VERDICT (round 4): the loop-timed A/B REFUTES the bet — per-block 0.033 ms
vs padded 0.150 ms — because inside one jitted program there is no per-op
dispatch overhead to amortize (the motivating 0.76 ms number was tunnel
dispatch). The padded path was removed from `kfac/chain.py`; this script
stays as the decision's evidence.

Usage::

    python benchmarks/micro_hetero_stack.py            # real device
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

# mnist MLP KFAC block factor sizes: A = [d_in+1]², G = [d_out]²
SHAPES = [(785, 1024), (1025, 512), (513, 256), (257, 128), (129, 64), (65, 10)]


def make_blocks(key):
    blocks = []
    for i, (a, g) in enumerate(SHAPES):
        ka, kg = jax.random.split(jax.random.fold_in(key, i))
        A = jax.random.normal(ka, (a, a), jnp.float32) / a
        G = jax.random.normal(kg, (g, g), jnp.float32) / g
        blocks.append((A + A.T, G + G.T))
    return blocks


def perblock_apply(blocks, comps):
    """Current form: two dots per block (K-leading kron_matmat, K=1)."""
    out = []
    for (A, G), x in zip(blocks, comps):
        # x: [K, a, g]
        x = jax.lax.dot_general(x, A, (((1,), (1,)), ((), ())))  # [K, g, a]
        x = jax.lax.dot_general(x, G, (((1,), (1,)), ((), ())))  # [K, a, g]
        out.append(x)
    return out


def pad_stack_blocks(blocks):
    Am = max(a for a, _ in SHAPES)
    Gm = max(g for _, g in SHAPES)
    As = jnp.stack(
        [jnp.pad(A, ((0, Am - A.shape[0]), (0, Am - A.shape[0]))) for A, _ in blocks]
    )
    Gs = jnp.stack(
        [jnp.pad(G, ((0, Gm - G.shape[0]), (0, Gm - G.shape[0]))) for _, G in blocks]
    )
    return As, Gs


def stacked_apply(As, Gs, comps):
    """Padded form: two batched dots for the whole chain."""
    Am, Gm = As.shape[-1], Gs.shape[-1]
    x = jnp.stack(
        [
            jnp.pad(c, ((0, 0), (0, Am - c.shape[1]), (0, Gm - c.shape[2])))
            for c in comps
        ]
    )  # [L, K, Am, Gm]
    x = jax.lax.dot_general(x, As, (((2,), (2,)), ((0,), (0,))))  # [L,K,Gm,Am]
    x = jax.lax.dot_general(x, Gs, (((2,), (2,)), ((0,), (0,))))  # [L,K,Am,Gm]
    return [x[i, :, : a, : g] for i, (a, g) in enumerate(SHAPES)]


def main() -> None:
    import run as _run
    from run import _timed_loop  # loop-embedded marginal-rate timing

    # sub-ms kernels need long loops for the marginal rate to clear the
    # session's timing noise (~a few ms between one-shot walls)
    _run.REPEATS_IN_LOOP = 1000
    _run.TIMED_RUNS = 5

    key = jax.random.key(0)
    blocks = make_blocks(key)
    As, Gs = pad_stack_blocks(blocks)
    comps0 = [
        jax.random.normal(jax.random.fold_in(key, 100 + i), (1, a, g), jnp.float32)
        for i, (a, g) in enumerate(SHAPES)
    ]

    # correctness: padded == per-block
    ref = perblock_apply(blocks, comps0)
    got = stacked_apply(As, Gs, comps0)
    for r, g_ in zip(ref, got):
        assert jnp.allclose(r, g_, atol=1e-4), float(jnp.abs(r - g_).max())

    flat_blocks = [f for blk in blocks for f in blk]

    def kern_per(comps, *fb):
        blks = [(fb[2 * i], fb[2 * i + 1]) for i in range(len(SHAPES))]
        return perblock_apply(blks, comps)

    def kern_stack(comps, As, Gs):
        return stacked_apply(As, Gs, comps)

    ms_per, _, stats_per = _timed_loop(kern_per, comps0, *flat_blocks)
    ms_stack, _, stats_stack = _timed_loop(kern_stack, comps0, As, Gs)

    # a non-positive marginal rate means the barrier could not resolve the
    # kernel at these loop lengths — bank the fact, never a 0.0 "time"
    FLOOR = 1e-3  # ms; conservative resolution floor at 1000-iter loops
    results = {
        "device": str(jax.devices()[0]),
        "shapes": SHAPES,
        # the loop length the harness actually measured at (escalation may
        # raise it past REPEATS_IN_LOOP; wrong provenance otherwise)
        "loop_iters": {
            "per-block": stats_per.get("loop_iters_used"),
            "padded": stats_stack.get("loop_iters_used"),
        },
        "per-block apply (ms)": (
            round(ms_per, 4) if ms_per > FLOOR else "below timing floor"
        ),
        "padded-stack apply (ms)": (
            round(ms_stack, 4) if ms_stack > FLOOR else "below timing floor"
        ),
        "speedup": (
            round(ms_per / ms_stack, 2)
            if ms_stack > FLOOR and ms_per > FLOOR
            else None
        ),
    }
    print(json.dumps(results, indent=2))
    out = Path(__file__).parent / "results" / "micro_hetero_stack.json"
    out.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
