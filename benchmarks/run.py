"""Full benchmark harness over the reference's four problems.

Counterpart of ``docs/examples/basic_usage/example_benchmark.py`` /
``benchmark_execute.py``: measures, per problem and operator,

- matvec time (device-side: the marginal rate between two data-dependent
  async dispatch chains with a host-readback barrier; ``min`` over repeats),
- precompute time for KFAC-like operators (factor build, eigendecomposition),
- peak device memory when the backend reports it,

and writes one JSON file per problem under ``benchmarks/results/``.

Usage::

    python benchmarks/run.py --problem mnist_mlp --ops gradient,ggn,kfac
    python benchmarks/run.py --problem cifar10_resnet18   # all default ops
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax_cfg  # noqa: E402

if "--cpu" in sys.argv:
    # env vars are TOO LATE on this machine (jax is pre-imported with the
    # axon platform pinned); only the config switch works. Without this
    # flag a "CPU" run silently lands on the shared TPU tunnel.
    _jax_cfg.config.update("jax_platforms", "cpu")
_jax_cfg.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
import numpy as np

REPEATS_IN_LOOP = 100
TIMED_RUNS = 3
# _timed_loop auto-escalates the loop length (x10, up to the cap) until the
# marginal WALL difference between the two loop lengths clears this floor —
# one-shot walls jitter ~1 ms through the tunnel, so an 8 ms difference is
# the resolution bound; below it the rate is noise (the round-3 mnist table
# banked 0.0 ms rows exactly this way).
_RESOLVE_S = 8e-3
_LOOP_ITERS_MAX = 100_000
TIMING = "loop"  # set from --timing; "chain" = legacy host-dispatch chains
RANKS = ()  # set from --rank; adds randomized rank-r build/matvec rows
def _device_peak_memory_gib() -> float | None:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return None


def _peak_flops_per_s() -> float | None:
    """Dense-matmul peak of the benchmark device, for MFU.

    TPU v5e (v5 lite): 197 TFLOP/s bf16 MXU peak — the right denominator
    for BOTH dtypes here because XLA lowers f32 matmuls/convs to bf16 MXU
    passes by default on this runtime (CLAUDE.md). Non-TPU backends return
    None (MFU vs a host CPU would be meaningless).
    """
    kind = str(jax.devices()[0])
    if "TPU v5" in kind or "TPU v6" in kind:
        return 197e12
    if "TPU" in kind:
        return 275e12  # v4 bf16 peak; only v5 is expected here
    return None


def _compiled_stats(jitted, *args) -> dict:
    """FLOPs + compile-time peak-memory of an already-compiled jit program.

    Uses the AOT path (``lower().compile()``): with the persistent compile
    cache on and the program already executed once, this re-serves the
    cached binary instead of re-compiling remotely. The tunnel backend
    exposes no RUNTIME memory stats, so compile-time ``memory_analysis``
    (argument/output/temp sizes) is the per-program memory ledger — same
    mechanism as ``reduce_memory_ab.py``. Returns {} for non-jit callables.
    """
    stats: dict = {}
    if not hasattr(jitted, "lower"):
        return stats
    try:
        compiled = jitted.lower(*args).compile()
    except Exception as e:  # noqa: BLE001 — stats must never fail a run
        print(f"compiled-stats unavailable: {e}", file=sys.stderr)
        return stats
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            stats["flops"] = flops
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        stats["temp_gib"] = round(mem.temp_size_in_bytes / 2**30, 3)
        stats["args_gib"] = round(mem.argument_size_in_bytes / 2**30, 3)
    except Exception:
        pass
    return stats


# Chain-timed rates below this are inside the dispatch-chain noise floor;
# an MFU ratio computed from a sub-floor timing is meaningless and has
# measured >100% on the mnist MLP. LOOP-timed rates carry their own
# ``resolved`` flag instead (the escalated loop resolves 10-30 µs kernels
# to a few percent — the wall difference between the two loop lengths is
# hundreds of ms — so a fixed per-application ms gate would wrongly ban
# every resolved sub-100 µs cell, which is exactly what banked the round-4
# mnist "n/a" MFU cells).
_MFU_MIN_MS = 0.1


def _fmt_s(ms: float):
    """Format a loop-timed rate (ms) as seconds without rounding-to-0.0.

    Fixed-decimal rounding banked a literal ``0.0 s`` for the mnist KFAC
    factor build (a real ~30 µs rate) — 4 significant figures keep any
    resolved rate nonzero, and a rate the escalated loop could not resolve
    at all (clamped to 0) banks an explicit sentinel, never 0.0.
    """
    if ms <= 0.0:
        return "below timing floor (loop-unresolved)"
    return float(f"{ms / 1e3:.4g}")


def _attach_stats(results: dict, label: str, ms: float, stats: dict) -> None:
    """Record MFU / FLOPs / peak-temp columns next to a timing row."""
    if not stats:
        return
    peak = _peak_flops_per_s()
    if stats.get("flops"):
        results[f"{label} flops (G)"] = round(stats["flops"] / 1e9, 2)
        trusted = (
            stats["resolved"] if "resolved" in stats else ms >= _MFU_MIN_MS
        )
        if peak and trusted and ms > 0.0:
            mfu = stats["flops"] / (ms / 1e3) / peak * 100
            results[f"{label} MFU (%)"] = round(mfu, 1)
        elif peak:
            results[f"{label} MFU (%)"] = "n/a (timing below loop resolution)"
    if stats.get("temp_gib") is not None:
        results[f"{label} peak temp (GiB)"] = stats["temp_gib"]
        results[f"{label} args (GiB)"] = stats["args_gib"]


def _timed_build(build, readback, n: int = 3) -> tuple[float, object]:
    """Median one-shot wall of ``n`` repeated WARM builds.

    One-shot build walls through the tunnel jitter by seconds (the same
    warm heuristic-inverse build measured 0.85 s and 2.23 s in two
    sessions, and one rank build banked a 20 s outlier): the median of
    three warm builds suppresses single-outlier walls while keeping the
    mandatory per-build readbacks — those ARE part of a build's cost
    (the ~0.2 s sub-second floor is fenced in RESULTS.md).  The caller
    warms the compiles with one untimed build first.
    """
    walls, out = [], None
    for _ in range(n):
        t0 = time.perf_counter()
        out = build()
        readback(out)
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls)), out


def _timed_chain(kernel_apply, init, *args, jit: bool = True) -> tuple[float, object]:
    """Per-application device time of a data-dependent dispatch chain.

    Each call consumes the previous output (no device-side overlap possible).
    The reported number is the MARGINAL rate between two chain lengths with a
    host scalar readback as the completion barrier — this cancels every fixed
    overhead (dispatch latency, tunnel round trips, readback) and cannot be
    fooled by runtimes whose ``block_until_ready`` returns early.
    """
    fn = jax.jit(lambda m, *a: kernel_apply(m, *a)) if jit else kernel_apply
    out = fn(init, *args)
    jax.block_until_ready(out)  # compile + warmup

    def run_chain(n: int) -> float:
        t0 = time.perf_counter()
        o = init
        for _ in range(n):
            o = fn(o, *args)
        float(jnp.sum(jax.tree.leaves(o)[0]))
        return time.perf_counter() - t0

    run_chain(3)
    n1, n2 = max(REPEATS_IN_LOOP // 5, 1), REPEATS_IN_LOOP
    # MEDIAN of the marginal rates, not min: this runtime's readback can
    # return EARLY (negative noise), and a single early return poisons a
    # min() forever.  Median-of-3 rejects one outlier in either direction.
    samples = []
    for _ in range(TIMED_RUNS):
        t1, t2 = run_chain(n1), run_chain(n2)
        samples.append((t2 - t1) / (n2 - n1))
    rate = float(np.median(samples))
    return max(rate, 0.0) * 1e3, out, _compiled_stats(fn, init, *args)


def _timed_loop(
    kernel_apply, init, *args, _iters=None
) -> tuple[float, object, dict]:
    """Per-application device time via ``lax.fori_loop`` embedding.

    `profile_solver_gap.py` measured ~1.5 ms of per-DISPATCH overhead on
    every link of a host-chained measurement through this tunnel — a cost
    the chain's marginal rate does NOT cancel (each extra link pays it).
    Iterating the identical kernel inside ONE loop program pays dispatch
    once per program, so the marginal rate between two loop lengths is
    pure device time (matters for every sub-10 ms cell; the bias is noise
    on 40+ ms cells). Iterations stay data-dependent — each consumes the
    previous output — so the runtime cannot pipeline or elide them.

    Sub-100 µs kernels cannot be resolved at the default loop lengths (the
    wall difference drowns in ~1 ms tunnel jitter): when the measured median
    difference is below ``_RESOLVE_S``, the loop length escalates x10 (cap
    ``_LOOP_ITERS_MAX``) and the measurement repeats — tiny kernels compile
    fast, so the extra loop programs are cheap exactly when escalation
    happens.

    FLOPs/memory stats come from the SINGLE-application program, never the
    loop: ``cost_analysis`` counts a ``while`` body once, not per trip.
    """
    n_loop = REPEATS_IN_LOOP if _iters is None else _iters
    n1, n2 = max(n_loop // 5, 1), n_loop

    def make(n):
        @jax.jit
        def run(m, *a):
            return jax.lax.fori_loop(
                0, n, lambda _, mm: kernel_apply(mm, *a), m
            )

        return run

    run1, run2 = make(n1), make(n2)
    out = run1(init, *args)
    jax.block_until_ready(out)
    jax.block_until_ready(run2(init, *args))

    def one_shot(runner) -> float:
        t0 = time.perf_counter()
        o = runner(init, *args)
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        return time.perf_counter() - t0

    one_shot(run1), one_shot(run2)  # pipeline warmup
    # median, not min — see _timed_chain: early readback returns are
    # negative noise that poisons a min().
    samples, diffs = [], []
    for _ in range(TIMED_RUNS):
        t1, t2 = one_shot(run1), one_shot(run2)
        samples.append((t2 - t1) / (n2 - n1))
        diffs.append(t2 - t1)
    if float(np.median(diffs)) < _RESOLVE_S and n_loop < _LOOP_ITERS_MAX:
        nxt = min(n_loop * 10, _LOOP_ITERS_MAX)
        print(
            f"loop length {n_loop} under-resolved "
            f"(median wall diff {float(np.median(diffs))*1e3:.2f} ms); "
            f"escalating to {nxt}",
            file=sys.stderr,
        )
        return _timed_loop(kernel_apply, init, *args, _iters=nxt)
    rate = float(np.median(samples))
    single = jax.jit(lambda m, *a: kernel_apply(m, *a))
    stats = _compiled_stats(single, init, *args)
    # provenance: the loop length actually MEASURED (escalation may have
    # raised it past the caller's REPEATS_IN_LOOP), and whether the wall
    # difference cleared the resolution floor — the MFU trust gate
    stats["loop_iters_used"] = n_loop
    stats["resolved"] = bool(float(np.median(diffs)) >= _RESOLVE_S)
    return max(rate, 0.0) * 1e3, out, stats


def _timed(kernel_apply, init, *args, jit: bool = True):
    """Dispatch on the selected timing methodology, falling back to the
    dispatch-chain form if the kernel cannot be embedded in a loop (e.g.
    carry structure mismatch)."""
    if TIMING == "loop":
        try:
            return _timed_loop(kernel_apply, init, *args)
        except Exception as e:  # noqa: BLE001 — measurement must not abort
            print(f"loop timing failed ({e!r}); using chain", file=sys.stderr)
    return _timed_chain(kernel_apply, init, *args, jit=jit)


def bench_matvec_operator(make_kernel, prob) -> tuple[float, dict]:
    """Device-time (ms) of one matvec of a per-batch curvature kernel."""
    X, y = prob.data[0]
    kernel = make_kernel(prob.model_fn, prob.loss_fn)
    M = jax.tree.map(lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), prob.params)
    key = jax.random.key(0)
    c = jnp.float32(1.0)

    ms, _, stats = _timed(
        lambda m, params, X, y: kernel(params, X, y, m, c, key),
        M,
        prob.params,
        X,
        y,
    )
    return ms, stats


def _timed_operator_matvec(A, M) -> float:
    """Loop-timed matvec of a ``LinearOperator`` via its ``traced()`` form.

    ``traced()`` hoists ALL operator state (Kronecker factors, eigenbases)
    into jit ARGUMENTS — embedding the 124M GPT's factors as loop-program
    closure constants would exceed the remote compile-request size limit.
    """
    if TIMING == "loop":
        try:
            fn, consts = A.traced(1)
            ms, _, _ = _timed_loop(lambda m, *c: fn(m, *c), M, *consts)
            return ms
        except Exception as e:  # noqa: BLE001
            print(f"loop timing failed ({e!r}); using chain", file=sys.stderr)
    ms, _, _ = _timed_chain(lambda m: A._matmat(m), M, jit=False)
    return ms


def _held_remat_for(prob):
    """Remat policy for ``linearized()`` on transformer problems: holding the
    full linearization of a T=1024 attention stack overflows HBM (the
    [B, H, T, T] residuals alone are ~2.9 GiB per batch; the Hessian's
    double-linearization OOMed at 18.9/15.7 GiB on v5e) — hold only the
    d_model-wide activations ([B, T, 768] = 12 MiB each; measured total
    args 12 GiB under a 64 MiB limit vs 15.75 GiB HBM) and recompute the
    4x-wide MLP intermediates and attention products per matvec."""
    from curvlinops_tpu.curvature.held import save_smaller_than

    if prob.name in ("synthetic_shakespeare_nanogpt", "synthetic_cifar10_vit"):
        return save_smaller_than(16 << 20)
    return None


def bench_held_matvec(prob, op_cls, **op_kwargs) -> tuple[float, dict]:
    """Device-time (ms) of one matvec with the model linearization HELD on
    device (``op.linearized()``): the primal forward (and, for the Hessian,
    the primal backward) is paid once at build, not per product."""
    op = op_cls(
        prob.model_fn,
        prob.loss_fn,
        prob.params,
        prob.data[:1],
        check_deterministic=False,
        **op_kwargs,
    )
    held = op.linearized(remat=_held_remat_for(prob))
    apply_jit, state, c = held._held[0]
    M = jax.tree.map(lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), prob.params)
    # c is already the device scalar HeldLinearizationOperator pre-transferred
    ms, _, _ = _timed(
        lambda m, state: apply_jit(state, m, c),
        M,
        state,
        jit=False,  # apply_jit is already the cached jitted program
    )
    # the wrapper lambda is not a jit program; lower the held kernel directly
    return ms, _compiled_stats(apply_jit, state, M, c)


def bench_forward(prob) -> tuple[float, dict]:
    """Plain model forward pass — the per-problem speed-of-light anchor.

    A curvature matvec is a fixed small multiple of forward work (GGN-VP
    ~= 3x fwd, HVP ~= 6x fwd): if a matvec's MFU matches the forward's,
    the composition is as fast as the model itself runs on this chip and
    further gains must come from the model code, not the operator.
    """
    X, y = prob.data[0]

    def fwd_step(out_prev, params, X, y):
        shifted = jnp.concatenate(
            [X.ravel()[:1] * 0 + jnp.sum(out_prev[:1]).astype(X.dtype),
             X.ravel()[1:]]
        ).reshape(X.shape)
        return prob.model_fn(params, shifted)

    out0 = jnp.zeros_like(prob.model_fn(prob.params, X))
    ms, _, stats = _timed(fwd_step, out0, prob.params, X, y)
    return ms, stats


def bench_gradient(prob) -> tuple[float, dict]:
    X, y = prob.data[0]

    def grad_step(g_prev, params, X, y):
        # feed the previous gradient back in so iterations are dependent
        shifted = jax.tree.map(lambda p, g: p + 0.0 * g, params, g_prev)
        return jax.grad(lambda p: prob.loss_fn(prob.model_fn(p, X), y))(shifted)

    g0 = jax.tree.map(jnp.zeros_like, prob.params)
    ms, _, stats = _timed(grad_step, g0, prob.params, X, y)
    return ms, stats


def _single_readback(tree) -> None:
    """Completion barrier: reduce EVERY array leaf into one device scalar
    (async elementwise dispatches), then ONE host readback. Per-leaf
    readbacks serialize ~30 ms round trips each on this tunnel; a
    single-leaf readback under-waits; ``block_until_ready`` has returned
    early (CLAUDE.md)."""
    total = None
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array):
            s = jnp.sum(jnp.abs(leaf.reshape(-1)[-1])).astype(jnp.float32)
            total = s if total is None else total + s
    if total is not None:
        float(total)


def bench_kfac(prob, results: dict, kfac_approx: str = "expand") -> None:
    from curvlinops_tpu.kfac.operator import KFACLinearOperator

    kfac = KFACLinearOperator(
        prob.kfac_model_fn,
        prob.loss_fn,
        prob.kfac_params,
        prob.data,
        fisher_type="mc",
        mc_samples=1,
        kfac_approx=kfac_approx,
        check_deterministic=False,
    )
    jax.block_until_ready((kfac._aaT, kfac._ggT))
    # factor build via the SAME marginal-rate chain as the matvecs: a scalar
    # reduced from every factor leaf feeds the next build's params, so each
    # link waits for the full build and fixed readback/dispatch costs cancel.
    # (One-shot wall timings here are barrier-dominated either way: per-leaf
    # readbacks cost n_leaves x 30 ms on this tunnel, and single-leaf
    # readbacks under-wait — both were measured and rejected.)
    X0, y0 = prob.data[0]
    computer = kfac._computer
    inner = computer._make_batch_kernel(computer._get_traced(X0))
    B = computer.batch_size_fn(X0)
    from curvlinops_tpu.kfac import math as _kmath

    corr = jnp.float32(
        _kmath.loss_correction(
            B,
            computer.num_per_example_loss_terms,
            prob.loss_fn.reduction,
            computer.num_data,
        )
    )
    fkey = jax.random.key(0)

    @jax.jit
    def factor_build_step(carry, frozen, params, X, y):
        # frozen is a jit ARGUMENT (CLAUDE.md: closure-captured constants
        # >100MB — e.g. the GPT's excluded embedding tables — get rejected
        # by the remote compile service)
        # cast the carry-coupling term to the PARAM dtype: bf16 + f32
        # scalar promotes to f32, which silently made --dtype bfloat16
        # factor builds measure an f32 kernel
        shifted = jax.tree.map(
            lambda p: p + (0.0 * carry).astype(p.dtype), params
        )
        aaT, ggT = inner(frozen, shifted, X, y, fkey, corr)
        total = jnp.asarray(0.0, jnp.float32)
        for leaf in jax.tree.leaves((aaT, ggT)):
            total = total + jnp.sum(jnp.abs(leaf[..., -1])).astype(jnp.float32)
        return total

    ms, _, stats = _timed(
        factor_build_step, jnp.float32(0.0), computer.frozen,
        prob.kfac_params, X0, y0, jit=False,
    )
    results["KFAC factors (s)"] = _fmt_s(ms)
    _attach_stats(results, "KFAC factors", ms, stats)

    M = jax.tree.map(
        lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), prob.kfac_params
    )
    results["KFAC matvec (ms)"] = round(_timed_operator_matvec(kfac, M), 3)

    # warm up the eigh compiles once, then time the steady-state build.
    # MEDIAN of 3 warm builds: one-shot build walls through the tunnel
    # jitter by seconds (the same heuristic build measured 0.85 s and
    # 2.23 s in two sessions; a rank build banked a 20 s outlier) — the
    # median suppresses outlier walls while keeping the mandatory
    # per-build readback, which IS part of a build's cost.
    inv = kfac.inverse(damping=1e-3, use_exact_damping=True)
    _single_readback(list(inv._blocks_data.values()))
    s, inv = _timed_build(
        lambda: kfac.inverse(damping=1e-3, use_exact_damping=True),
        lambda o: _single_readback(list(o._blocks_data.values())),
    )
    results["KFAC exact-damped inverse build (s)"] = round(s, 4)
    results["KFAC inverse matvec (ms)"] = round(
        _timed_operator_matvec(inv, M), 3
    )

    # heuristic (Cholesky) damped inverse: the recipe class of the
    # reference's own "KFAC Cholesky inverse" phase (BASELINE.md) — factor
    # Cholesky solves, no eigh anywhere; the natural-gradient composite's
    # cheap path on problems where exact damping is eigh-bound
    hinv = kfac.inverse(damping=1e-3, use_heuristic_damping=True)
    _single_readback(list(hinv._blocks_data.values()))
    s, hinv = _timed_build(
        lambda: kfac.inverse(damping=1e-3, use_heuristic_damping=True),
        lambda o: _single_readback(list(o._blocks_data.values())),
    )
    results["KFAC heuristic inverse build (s)"] = round(s, 4)
    results["KFAC heuristic inverse matvec (ms)"] = round(
        _timed_operator_matvec(hinv, M), 3
    )
    del hinv

    for RANK in RANKS:
        # randomized rank-r inverse build: matmul-bound replacement for the
        # eigh-bound phase above (kfac/randomized.py)
        rinv = kfac.inverse(
            damping=1e-3, use_exact_damping=True, rank=RANK
        )
        _single_readback(list(rinv._blocks_data.values()))
        s, rinv = _timed_build(
            lambda: kfac.inverse(
                damping=1e-3, use_exact_damping=True, rank=RANK
            ),
            lambda o: _single_readback(list(o._blocks_data.values())),
        )
        results[f"KFAC inverse build rank={RANK} (s)"] = round(s, 4)
        results[f"KFAC inverse matvec rank={RANK} (ms)"] = round(
            _timed_operator_matvec(rinv, M), 3
        )
        # quality: normwise deviation from the exact damped inverse on the
        # REAL factors (the micro benchmark uses synthetic spectra)
        ex = inv @ M
        ap = rinv @ M
        num = den = jnp.asarray(0.0, jnp.float32)
        for e, a in zip(jax.tree.leaves(ex), jax.tree.leaves(ap)):
            num = num + jnp.sum((e - a).astype(jnp.float32) ** 2)
            den = den + jnp.sum(e.astype(jnp.float32) ** 2)
        results[f"KFAC inverse rank={RANK} rel err"] = round(
            float(jnp.sqrt(num / den)), 5
        )
        del rinv, ex, ap
    del inv, kfac, M  # release factor HBM before the next phase


def bench_ekfac(prob, results: dict) -> None:
    from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator

    ekfac = EKFACLinearOperator(
        prob.kfac_model_fn,
        prob.loss_fn,
        prob.kfac_params,
        prob.data,
        fisher_type="mc",
        mc_samples=1,
        check_deterministic=False,
    )
    jax.block_until_ready(ekfac._lambdas)

    M = jax.tree.map(
        lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), prob.kfac_params
    )
    results["EKFAC matvec (ms)"] = round(
        _timed_operator_matvec(ekfac, M), 3
    )

    # steady-state build: kernels are compiled; drop the operator's factor
    # state first so only one eigendecomposition set is alive at a time
    computer = ekfac._computer
    del ekfac
    s, out = _timed_build(
        computer.compute_ekfac, lambda o: _single_readback(o[:3])
    )
    results["EKFAC build (s)"] = round(s, 4)
    del computer, out

    for RANK in RANKS:
        from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator as _EK

        rek = _EK(
            prob.kfac_model_fn,
            prob.loss_fn,
            prob.kfac_params,
            prob.data,
            fisher_type="mc",
            mc_samples=1,
            check_deterministic=False,
            rank=RANK,
        )
        results[f"EKFAC matvec rank={RANK} (ms)"] = round(
            _timed_operator_matvec(rek, M), 3
        )
        computer = rek._computer
        del rek
        s, out = _timed_build(
            computer.compute_ekfac, lambda o: _single_readback(o[:3])
        )
        results[f"EKFAC build rank={RANK} (s)"] = round(s, 4)
    del M


def run_benchmarks(prob, ops, results: dict) -> None:
    """Dispatch the selected operator benchmarks into ``results``."""
    from curvlinops_tpu.curvature.ef import make_batch_ef_matmat
    from curvlinops_tpu.curvature.ggn import (
        make_batch_ggn_matmat,
        make_batch_ggn_mc_matmat,
    )
    from curvlinops_tpu.curvature.hessian import make_batch_hessian_matmat

    def _row(label: str, pair: tuple[float, dict]) -> None:
        ms, stats = pair
        results[f"{label} (ms)"] = round(ms, 3)
        _attach_stats(results, label, ms, stats)

    if "forward" in ops:
        _row("forward", bench_forward(prob))
    if "gradient" in ops:
        _row("gradient+loss", bench_gradient(prob))
    if "hessian" in ops:
        _row("Hessian matvec",
             bench_matvec_operator(make_batch_hessian_matmat, prob))
    if "ggn" in ops:
        _row("GGN matvec", bench_matvec_operator(make_batch_ggn_matmat, prob))
    if "ggn_mc" in ops:
        _row("MC-Fisher matvec", bench_matvec_operator(
            lambda f, l: make_batch_ggn_mc_matmat(f, l, 1), prob
        ))
    if "ef" in ops:
        _row("Empirical Fisher matvec",
             bench_matvec_operator(make_batch_ef_matmat, prob))
    if "held_ggn" in ops:
        from curvlinops_tpu.curvature.ggn import GGNLinearOperator

        _row("GGN matvec, held linearization",
             bench_held_matvec(prob, GGNLinearOperator))
    if "held_hessian" in ops:
        from curvlinops_tpu.curvature.hessian import HessianLinearOperator

        _row("Hessian matvec, held linearization",
             bench_held_matvec(prob, HessianLinearOperator))
    if "kfac" in ops:
        bench_kfac(prob, results, kfac_approx=results.get("kfac_approx", "expand"))
    if "ekfac" in ops:
        bench_ekfac(prob, results)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--problem",
        default="mnist_mlp",
        choices=["mnist_mlp", "cifar10_resnet18", "imagenet_resnet50",
                 "shakespeare_nanogpt", "cifar10_vit"],
    )
    parser.add_argument(
        "--ops",
        default="forward,gradient,hessian,ggn,ggn_mc,ef,kfac,ekfac",
        # extra (off by default): held_ggn, held_hessian — matvecs with the
        # model linearization held on device (op.linearized())
        help="comma-separated subset",
    )
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="parameter/activation dtype (bfloat16 = TPU-native speed mode)",
    )
    parser.add_argument(
        "--scan-blocks", action="store_true",
        help="scan-stacked blocks (shakespeare_nanogpt and cifar10_vit)",
    )
    parser.add_argument(
        "--attention", default=None, choices=["fused", "einsum", "flash"],
        help="attention implementation for shakespeare_nanogpt (flash = "
        "Pallas TPU kernel, reverse-mode only: gradient/kfac/ekfac ops)",
    )
    parser.add_argument(
        "--kfac-approx", default="expand", choices=["expand", "reduce"],
        help="KFAC sharing approximation for the kfac benchmark "
        "(reduce exercises the averaged-patch no-materialization path)",
    )
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (handled at import; listed here so "
        "argparse accepts it)",
    )
    parser.add_argument(
        "--rank", type=str, default=None,
        help="also measure the randomized rank-r KFAC inverse / EKFAC "
        "builds (kfac/randomized.py) at these comma-separated rank(s); "
        "one run amortizes the exact-eigh baseline across ranks",
    )
    parser.add_argument(
        "--timing", default="loop", choices=["loop", "chain"],
        help="loop (default): fori_loop-embedded marginal rate, pure device "
        "time; chain: legacy host-dispatch chains (+~1.5 ms/link tunnel "
        "dispatch tax, but no extra loop-program compiles)",
    )
    parser.add_argument(
        "--loop-iters", type=int, default=None,
        help="starting fori_loop length for --timing loop (default 100; "
        "auto-escalates x10 when the marginal wall difference is below the "
        "resolution floor — set it directly to skip the escalation compiles "
        "on problems known to need long loops, e.g. mnist_mlp)",
    )
    parser.add_argument(
        "--profile", metavar="DIR", default=None,
        help="capture a jax.profiler trace of the measured region into DIR "
        "(view with TensorBoard / xprof; SURVEY §5 tracing hook)",
    )
    args = parser.parse_args()

    from curvlinops_tpu.models import PROBLEMS

    setup = PROBLEMS["synthetic_" + args.problem]
    import inspect

    accepted = set(inspect.signature(setup).parameters)
    setup_kwargs = {"dtype": jnp.dtype(args.dtype)}
    if args.batch_size:
        setup_kwargs["batch_size"] = args.batch_size
    if args.scan_blocks:
        setup_kwargs["scan_blocks"] = True
    if args.attention:
        setup_kwargs["attention_impl"] = args.attention
    unsupported = set(setup_kwargs) - accepted
    if unsupported:
        parser.error(
            f"--problem {args.problem} does not support "
            f"{sorted(unsupported)} (accepts {sorted(accepted)})"
        )
    ops = args.ops.split(",")
    known_ops = {
        "forward", "gradient", "hessian", "ggn", "ggn_mc", "ef", "held_ggn",
        "held_hessian", "kfac", "ekfac",
    }
    unknown = [o for o in ops if o not in known_ops]
    if unknown:  # a typo'd op silently skipping would corrupt provenance
        parser.error(f"unknown --ops {unknown}; known: {sorted(known_ops)}")
    global TIMING, RANKS, REPEATS_IN_LOOP
    TIMING = args.timing
    if args.rank:  # validate BEFORE device touch
        try:
            RANKS = tuple(int(r) for r in args.rank.split(","))
        except ValueError:
            parser.error(f"--rank must be comma-separated ints: {args.rank!r}")
        if any(r < 1 for r in RANKS):
            parser.error(f"--rank values must be >= 1: {args.rank!r}")
    if args.loop_iters is not None:
        # validate BEFORE device touch; a negative value would recurse the
        # escalation in _timed_loop forever (fori_loop(0, n<=0) runs 0
        # iterations, so the marginal diff never clears the floor)
        if args.loop_iters < 5:
            parser.error("--loop-iters must be >= 5")
        REPEATS_IN_LOOP = args.loop_iters
    prob = setup(**setup_kwargs)

    print(f"problem={prob.name} device={jax.devices()[0]}", file=sys.stderr)
    results: dict = {
        "problem": prob.name,
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
        "timing": args.timing,
    }
    if args.scan_blocks:
        results["scan_blocks"] = True
    if args.kfac_approx != "expand":
        results["kfac_approx"] = args.kfac_approx
    if args.attention:
        results["attention"] = args.attention

    import contextlib

    # opt-in device tracing (SURVEY §5): the trace covers exactly the
    # measured region and opens in TensorBoard / xprof
    profile_ctx = (
        jax.profiler.trace(args.profile)
        if args.profile
        else contextlib.nullcontext()
    )
    with profile_ctx:
        run_benchmarks(prob, ops, results)

    peak = _device_peak_memory_gib()
    if peak is not None:
        results["peak device memory (GiB)"] = round(peak, 3)

    out_dir = Path(__file__).parent / "results"
    out_dir.mkdir(exist_ok=True)
    suffix = "" if args.dtype == "float32" else f"_{args.dtype}"
    if args.batch_size:  # non-default batch: own file, never merge cross-B
        suffix += f"_b{args.batch_size}"
    if args.kfac_approx != "expand":
        suffix += f"_{args.kfac_approx}"
    if args.scan_blocks:
        suffix += "_scan"
    if args.attention:
        suffix += f"_{args.attention}"
    if args.cpu:
        # smoke-test mode: never let CPU walls overwrite device results
        print(json.dumps(results, indent=2))
        return
    out_file = out_dir / f"{prob.name}{suffix}.json"
    if out_file.exists():  # merge: partial runs must not drop earlier metrics
        merged = json.loads(out_file.read_text())
        merged.update(results)
        results = merged
    out_file.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
