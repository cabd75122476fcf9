#!/usr/bin/env bash
# Remaining round-3 TPU queue (tunnel was down mid-batch): small problems
# first to bank results, then the two big fp32 tables + bf16 stat rows.
set -x
cd "$(dirname "$0")/.."
python benchmarks/run.py --problem mnist_mlp
python benchmarks/micro_hetero_stack.py
python benchmarks/run.py --problem cifar10_vit
python benchmarks/run.py --problem imagenet_resnet50 --dtype bfloat16 --ops forward,gradient,hessian,ggn
python benchmarks/run.py --problem shakespeare_nanogpt --dtype bfloat16 --ops forward,gradient,hessian,ggn
python benchmarks/run.py --problem imagenet_resnet50
python benchmarks/run.py --problem shakespeare_nanogpt
