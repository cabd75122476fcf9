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

# persistent compile cache: repeated bench runs skip the slow remote compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPEATS = 100
BASELINE_COMPILED_MS = 16.0  # RTX A6000, torch.compile (BASELINE.md)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _wait_for_device(max_wait_s: float = 1200.0) -> bool:
    """Block until the TPU tunnel answers a trivial matmul.

    The axon tunnel goes UNAVAILABLE for minutes at a time (and a hung RPC
    never returns), so the probe runs in a SUBPROCESS with a hard timeout —
    the probe process exits before this process touches the device, keeping
    the one-TPU-process-at-a-time rule. Returns False if the device never
    answered: the caller must NOT touch the backend then (jax.devices()
    would hang forever) and should emit a sentinel result instead."""
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp; "
        "x = jnp.ones((8, 8)); print(float((x @ x).sum()))"
    )
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            res = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=120,
                capture_output=True,
            )
            if res.returncode == 0:
                if attempt > 1:
                    print(f"device up after {attempt} probes", file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print(
                "WARNING: device probe never succeeded", file=sys.stderr
            )
            return False
        print(f"device probe {attempt} failed; retrying in 30s", file=sys.stderr)
        time.sleep(30)


def main() -> None:
    from curvlinops_tpu.curvature.ggn import make_batch_ggn_matmat
    from curvlinops_tpu.models import cifar10_resnet18

    if not _wait_for_device():
        # tunnel dead: report a sentinel rather than hanging on the first
        # backend touch (a hung RPC never returns on this runtime)
        print(
            json.dumps(
                {
                    "metric": "GGN-VP matvec, ResNet-18/CIFAR-10 (B=512)",
                    "value": None,
                    "unit": "ms",
                    "vs_baseline": None,
                    "error": "TPU tunnel unreachable",
                }
            )
        )
        return
    print(f"benchmark device: {jax.devices()[0]}", file=sys.stderr)

    prob = cifar10_resnet18(batch_size=512)
    X, y = prob.data[0]
    kernel = make_batch_ggn_matmat(prob.model_fn, prob.loss_fn)

    key = jax.random.key(0)
    M = jax.tree.map(
        lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), prob.params
    )
    c = jnp.float32(1.0)

    # params/X/y enter as jit ARGUMENTS — closure capture would embed ~51MB
    # of HLO constants (CLAUDE.md: the remote compile service rejects >100MB
    # bodies; this template must survive bigger models/batches)
    n1, n2 = REPEATS // 5, REPEATS

    def make_loops(kern, cc, kk):
        """Two fori_loop programs iterating the matvec n1/n2 times.

        The marginal rate between the two loop lengths is pure device time:
        per-DISPATCH overhead (~1.5 ms/link through this tunnel,
        `benchmarks/profile_solver_gap.py` A-vs-B) rides every link of a
        host-chained measurement and does NOT cancel in its marginal rate,
        while the loop form pays dispatch once per program. Iterations stay
        data-dependent (each consumes the previous product), so the runtime
        cannot pipeline or elide them; the torch.compile baseline is a
        steady-state device rate too, so this is the fair comparison.
        """
        def loop(n):
            @jax.jit
            def run(m, p, X, y):
                return jax.lax.fori_loop(
                    0, n, lambda _, mm: kern(p, X, y, mm, cc, kk), m
                )
            return run
        return loop(n1), loop(n2)

    def median_loop_rate(loop1, loop2, M, *args) -> float:
        def one_shot(loop) -> float:
            t0 = time.perf_counter()
            o = loop(M, *args)
            # pull one scalar to host: completion cannot be faked
            float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
            return time.perf_counter() - t0

        one_shot(loop1), one_shot(loop2)  # pipeline warmup
        # MEDIAN of 3 so one tunnel hiccup cannot move the headline
        # (fp32 straddled the 10x line across sessions on best-of noise)
        rates = []
        for _ in range(3):
            t1, t2 = one_shot(loop1), one_shot(loop2)
            rates.append((t2 - t1) / (n2 - n1))
        return sorted(rates)[1] * 1e3

    t0 = time.perf_counter()
    loop1, loop2 = make_loops(kernel, c, key)
    jax.block_until_ready(loop1(M, prob.params, X, y))
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    ms = median_loop_rate(loop1, loop2, M, prob.params, X, y)

    # bf16 storage run: half the HBM traffic on the conv/matmul operands —
    # the dtype large-scale users actually run; reported alongside fp32
    prob_b = cifar10_resnet18(batch_size=512, dtype=jnp.bfloat16)
    Xb, yb = prob_b.data[0]
    params_b = prob_b.params
    Mb = jax.tree.map(
        lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), params_b
    )
    t0 = time.perf_counter()
    loop1_b, loop2_b = make_loops(kernel, c, key)
    jax.block_until_ready(loop1_b(Mb, params_b, Xb, yb))
    print(f"bf16 compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    ms_b = median_loop_rate(loop1_b, loop2_b, Mb, params_b, Xb, yb)

    if not ms > 0:  # noise/misbehaving barrier: report a sentinel, not 1/0
        print(f"WARNING: non-positive marginal rate {ms} ms", file=sys.stderr)
        ms = float("nan")
    if not ms_b > 0:
        ms_b = float("nan")
    print(
        json.dumps(
            {
                "metric": "GGN-VP matvec, ResNet-18/CIFAR-10 (B=512)",
                "value": round(ms, 3) if ms == ms else None,
                "unit": "ms",
                "vs_baseline": (
                    round(BASELINE_COMPILED_MS / ms, 2) if ms == ms else None
                ),
                # baseline is an RTX A6000 torch.compile run (BASELINE.md);
                # an A100 is ~1.3-2x an A6000 on these workloads, so divide
                # vs_baseline accordingly for an A100-relative margin
                "bf16_ms": round(ms_b, 3) if ms_b == ms_b else None,
                "bf16_vs_baseline": (
                    round(BASELINE_COMPILED_MS / ms_b, 2) if ms_b == ms_b
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
