#!/usr/bin/env bash
# The device measurements queued behind the round-2 tunnel outage
# (CLAUDE.md / benchmarks/RESULTS.md). Run with the TPU tunnel UP (probe
# with a trivial matmul first; never run two TPU processes concurrently).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== probe ==" >&2
timeout 120 python -u -c "
import jax, jax.numpy as jnp
print('probe:', float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >&2

echo "== estimator/solver layer (adds slq_logdet + MINRES rows) ==" >&2
python benchmarks/run_estimators.py

echo "== held-linearization matvecs (ResNet-18) ==" >&2
python benchmarks/run.py --problem cifar10_resnet18 --ops held_ggn,held_hessian

echo "== held-linearization matvecs (nanoGPT) ==" >&2
python benchmarks/run.py --problem shakespeare_nanogpt --ops held_ggn,held_hessian

echo "Done; fold the new rows into benchmarks/RESULTS.md." >&2
