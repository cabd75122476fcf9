"""Unit tests for the benchmark tooling that feeds published tables.

The HBM-boundary ladder (``benchmarks/hbm_boundary_ladder.py``) and table
renderer (``benchmarks/make_boundary_table.py``) decide what gets probed on
the real chip and what RESULTS.md claims — their pure logic (power-of-two
bracketing, cell rendering, OOM-evidence status) is tested here on CPU.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

BENCH = Path(__file__).resolve().parent.parent / "benchmarks"


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, BENCH / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    # hbm_boundary_ladder imports only stdlib at module scope — safe to exec
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_next_batch_bracketing():
    ladder = _load("hbm_boundary_ladder")
    nb = ladder.next_batch
    # empty cell: probe the seed
    assert nb({}, 64) == 64
    # seed fits: double
    assert nb({64: True}, 64) == 128
    # bracketed (OOM at exactly 2x the best fit): done
    assert nb({64: True, 128: False}, 64) is None
    # everything OOMs so far: halve toward 1
    assert nb({64: False}, 64) == 32
    assert nb({1: False}, 64) is None  # can't go below B=1
    # wide gap from mixed seeds: geometric bisection on powers of two
    mid = nb({16: True, 1024: False}, 16)
    assert mid is not None and 16 < mid < 1024 and mid & (mid - 1) == 0
    # fits below a seed that sits higher: jump to the seed, not 2x
    assert nb({8: True}, 512) == 512
    # OOM above a seed that sits lower: jump to the seed, not half
    assert nb({1024: False}, 64) == 64
    # safety stop: beyond MAX_BATCH the cell reports unbracketed
    assert nb({ladder.MAX_BATCH: True}, 8) is None


def test_next_batch_converges_from_any_seed():
    ladder = _load("hbm_boundary_ladder")
    true_boundary = 256  # fits at <=256, OOMs above
    for seed in (1, 8, 256, 4096, 1 << 20):
        probes: dict[int, bool] = {}
        for _ in range(40):
            b = ladder.next_batch(probes, seed)
            if b is None:
                break
            probes[b] = b <= true_boundary
        fits = [b for b, ok in probes.items() if ok]
        ooms = [b for b, ok in probes.items() if not ok]
        assert max(fits) == 256 and min(ooms) == 512, (seed, probes)


def test_render_cell_states():
    table = _load("make_boundary_table")
    rc = table.render_cell
    assert rc({}) == "—"
    assert rc({8: {"fits": True}}) == ">= 8 (unbracketed)"
    assert rc({8: {"fits": True}, 16: {"fits": False}}) == "**8** (OOM at 16)"
    assert "no fitting probe" in rc({4: {"fits": False}})
    # a stale wide gap renders as unbracketed, never as a boundary claim
    assert rc({8: {"fits": True}, 1024: {"fits": False}}).startswith(">= 8")


def test_oom_evidence_extraction():
    """hbm_boundary's marker search finds the ledger, not service noise."""
    msg = (
        "INTERNAL: http 500: helper subprocess exit code 1\n"
        "WARN axon noise about timeouts\n"
        "Ran OUT OF MEMORY in memory space hbm. Used 20.1G of 15.7G\n"
        "  Largest program allocations:\n"
        "  1. Size: 4.00G; Allocation type: HLO temp\n"
    )
    low = msg.lower()
    markers = ["resource_exhausted", "out of memory",
               "allocation type: hlo temp"]
    matched = next((m for m in markers if m in low), None)
    assert matched == "out of memory"
    lines = msg.splitlines()
    idx = next((i for i, ln in enumerate(lines) if matched in ln.lower()), 0)
    # must anchor on the ledger line, not the "timeouts" noise line
    assert "memory space hbm" in lines[idx]
