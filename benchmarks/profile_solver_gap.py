"""Root-cause the fused-solver iteration-cost gap (VERDICT round 2, item 2).

Round-2 numbers: CG maxiter=100 on the ResNet-18/CIFAR-10 (B=512) damped GGN
took 2.70 s one-shot (~27 ms/iteration) while the standalone GGN-VP marginal
rate is ~1.5 ms — an unexplained ~17x. This script separates the candidate
causes with four measurements on the SAME operator:

A. dispatch-chained matvecs, marginal rate between chain lengths
   (bench.py methodology) — the 1.5 ms reference point;
B. the identical traced() matvec iterated inside ONE ``lax.fori_loop``
   program, marginal rate between loop lengths — isolates "while/fori
   embedding of the matvec" from CG's extra vector ops;
C. the real CG program at tol=0 (no early exit), marginal rate between
   maxiter=100 and maxiter=1000 — the honest per-iteration cost with every
   fixed overhead (dispatch, readback, tunnel) cancelled.  (Round 3 used
   20 vs 100 with a MIN over repeats and banked a negative rate: an early
   readback return makes a wall undercount, and min() keeps exactly those
   poisoned samples.  Medians + 10x longer loops put the signal far above
   the noise; a maxiter=300 point checks wall monotonicity.);
D. the one-shot CG wall time exactly as ``run_estimators.py`` measured it —
   reproduces the 2.7 s number so the constant part is quantified.

It also records compiled FLOP counts (``cost_analysis``) for the standalone
matvec and the CG programs: if CG's flops >> maxiter x matvec flops, the gap
is padded/recomputed work (e.g. column chunking), not scheduling.

Usage (TPU tunnel up, no other TPU process)::

    python benchmarks/profile_solver_gap.py
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

N1, N2 = 20, 100


def _flops(compiled) -> float | None:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001 — remote backends may not expose it
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return None


def main() -> None:
    import curvlinops_tpu as cl
    from curvlinops_tpu.models import cifar10_resnet18

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    results: dict = {"device": str(jax.devices()[0])}

    prob = cifar10_resnet18(batch_size=512)
    G = cl.GGNLinearOperator(
        prob.model_fn, prob.loss_fn, prob.params, prob.data,
        check_deterministic=False, max_vmap_columns=8,
    )
    damped = G + 1e-3 * cl.IdentityLinearOperator(G.in_spec)
    grad, _ = G.gradient_and_loss()
    gradc = jax.tree.map(lambda leaf: leaf[..., None], grad)

    fn, consts = damped.traced(ncols=1)
    jitted_mv = jax.jit(fn)

    # ---- A: dispatch-chained matvec marginal rate -------------------- #
    t0 = time.perf_counter()
    jax.block_until_ready(jitted_mv(gradc, *consts))
    print(f"matvec compile+run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        o = gradc
        for _ in range(n):
            o = jitted_mv(o, *consts)
        float(jnp.sum(jax.tree.leaves(o)[0]))
        return time.perf_counter() - t0

    chain(5)
    rates = []
    for _ in range(3):
        t1, t2 = chain(N1), chain(N2)
        rates.append((t2 - t1) / (N2 - N1))
    a_ms = sorted(rates)[1] * 1e3
    results["A dispatch-chained matvec (ms/mv)"] = round(a_ms, 3)
    print(f"A: {a_ms:.3f} ms/mv", file=sys.stderr)
    mv_flops = _flops(jax.jit(fn).lower(gradc, *consts).compile())
    if mv_flops is not None:
        results["matvec flops (G)"] = round(mv_flops / 1e9, 2)

    # ---- B: same matvec inside one fori_loop program ------------------ #
    def loop_prog(n: int):
        def run(M, *consts):
            return jax.lax.fori_loop(
                0, n, lambda _, carry: fn(carry, *consts), M
            )
        return jax.jit(run)

    loops = {}
    for n in (N1, N2):
        t0 = time.perf_counter()
        p = loop_prog(n)
        jax.block_until_ready(p(gradc, *consts))
        print(f"fori({n}) compile+run: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        loops[n] = p

    def one_shot(callable_, *args) -> float:
        # MEDIAN of 5, never min: an early readback return undercounts a
        # wall, and min() keeps exactly the poisoned samples (the round-3
        # negative-marginal-rate bug in this script's part C).
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = callable_(*args)
            float(jnp.sum(jax.tree.leaves(out)[0]))
            samples.append(time.perf_counter() - t0)
        return float(sorted(samples)[len(samples) // 2])

    tb1 = one_shot(loops[N1], gradc, *consts)
    tb2 = one_shot(loops[N2], gradc, *consts)
    b_ms = (tb2 - tb1) / (N2 - N1) * 1e3
    results[f"B fori_loop matvec (ms/mv, {N1} vs {N2})"] = round(b_ms, 3)
    results["B fori_loop one-shot walls (s)"] = [round(tb1, 3), round(tb2, 3)]
    print(f"B: {b_ms:.3f} ms/mv (walls {tb1:.3f}/{tb2:.3f}s)", file=sys.stderr)
    f_loop = _flops(loops[N2].lower(gradc, *consts).compile())
    if f_loop is not None and mv_flops:
        results["B flops vs n*matvec"] = round(f_loop / (N2 * mv_flops), 2)

    # ---- C: real CG program, tol=0, marginal over maxiter ------------- #
    C1, CM, C2 = 100, 300, 1000
    walls = {}
    for maxiter in (C1, CM, C2):
        cg = cl.CGInverseLinearOperator(damped, maxiter=maxiter, tol=0.0,
                                        atol=0.0)
        t0 = time.perf_counter()
        out = cg @ grad
        jax.block_until_ready(jax.tree.leaves(out)[0])
        print(f"CG({maxiter}) compile+run: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        walls[maxiter] = one_shot(lambda: cg @ grad)
    c_ms = (walls[C2] - walls[C1]) / (C2 - C1) * 1e3
    results[f"C CG tol=0 (ms/iter, {C1} vs {C2})"] = round(c_ms, 3)
    results["C CG one-shot walls (s)"] = {
        str(m): round(walls[m], 3) for m in (C1, CM, C2)
    }
    results["C walls monotone"] = walls[C1] < walls[CM] < walls[C2]
    print(
        f"C: {c_ms:.3f} ms/iter (walls "
        f"{walls[C1]:.3f}/{walls[CM]:.3f}/{walls[C2]:.3f}s, "
        f"monotone={results['C walls monotone']})",
        file=sys.stderr,
    )

    # ---- D: reproduce the round-2 one-shot methodology ---------------- #
    cg_r2 = cl.CGInverseLinearOperator(damped, maxiter=100, tol=1e-6)
    out = cg_r2 @ grad  # warmup/compile
    jax.block_until_ready(jax.tree.leaves(out)[0])
    d = one_shot(lambda: cg_r2 @ grad)
    results["D one-shot CG maxiter=100 tol=1e-6 (s)"] = round(d, 3)
    print(f"D: {d:.3f} s one-shot (round-2 methodology)", file=sys.stderr)

    out_path = Path(__file__).parent / "results" / "solver_gap_profile.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
