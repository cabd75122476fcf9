#!/usr/bin/env bash
# Round-3 follow-up TPU batch (run AFTER tools/run_round3_tpu.sh):
#  - mnist re-run: picks up the MFU resolution floor AND the zero-padded
#    batched block apply (kfac/chain.py) — the KFAC-family cells are the
#    A/B's integrated effect
#  - micro_hetero_stack: the isolated padded-stack vs per-block A/B
#  - ViT rows: a fifth problem column beyond the reference's four
set -euo pipefail
cd "$(dirname "$0")/.."

python benchmarks/micro_hetero_stack.py
python benchmarks/run.py --problem mnist_mlp
python benchmarks/run.py --problem cifar10_vit
