#!/usr/bin/env bash
# Round-3 TPU queue D: re-verify bf16 GGN row, re-run the two micro
# benchmarks fixed this session (median timing, device field), then the
# headline randomized rank-128 build rows on the 124M GPT.
set -x
cd "$(dirname "$0")/.."
python benchmarks/run.py --problem shakespeare_nanogpt --dtype bfloat16 --ops ggn
python benchmarks/micro_hetero_stack.py
python benchmarks/micro_randomized_inverse.py
python benchmarks/run.py --problem shakespeare_nanogpt --ops kfac,ekfac --rank 128
