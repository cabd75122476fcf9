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
    jitted = jax.jit(lambda m, p, X, y: kernel(p, X, y, m, c, key))
    matvec = lambda m: jitted(m, prob.params, X, y)  # noqa: E731

    # warm up (compile)
    t0 = time.perf_counter()
    out = matvec(M)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    def run_chain(n: int) -> float:
        """Wall time of n data-dependent matvecs, host-readback barrier."""
        t0 = time.perf_counter()
        o = M
        for _ in range(n):
            o = matvec(o)
        # pull one scalar to host: completion cannot be faked by the runtime
        float(jnp.sum(jax.tree.leaves(o)[0]))
        return time.perf_counter() - t0

    run_chain(5)  # pipeline warmup
    # marginal rate between two chain lengths cancels every fixed overhead
    # (dispatch latency, readback, tunnel round trips); MEDIAN of 3 repeats
    # so one tunnel hiccup in either direction cannot move the headline
    # (fp32 straddled the 10x line across sessions on best-of noise alone)
    n1, n2 = REPEATS // 5, REPEATS
    rates = []
    for _ in range(3):
        t1, t2 = run_chain(n1), run_chain(n2)
        rates.append((t2 - t1) / (n2 - n1))
    ms = sorted(rates)[1] * 1e3

    # bf16 storage run: half the HBM traffic on the conv/matmul operands —
    # the dtype large-scale users actually run; reported alongside fp32
    prob_b = cifar10_resnet18(batch_size=512, dtype=jnp.bfloat16)
    Xb, yb = prob_b.data[0]
    params_b = prob_b.params
    Mb = jax.tree.map(
        lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype), params_b
    )
    jitted_b = jax.jit(lambda m, p, X, y: kernel(p, X, y, m, c, key))
    matvec_b = lambda m: jitted_b(m, params_b, Xb, yb)  # noqa: E731

    def run_chain_b(n: int) -> float:
        t0 = time.perf_counter()
        o = Mb
        for _ in range(n):
            o = matvec_b(o)
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(matvec_b(Mb))
    print(f"bf16 compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    run_chain_b(5)
    rates_b = []
    for _ in range(3):
        t1, t2 = run_chain_b(n1), run_chain_b(n2)
        rates_b.append((t2 - t1) / (n2 - n1))
    ms_b = sorted(rates_b)[1] * 1e3

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
