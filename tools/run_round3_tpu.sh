#!/usr/bin/env bash
# Round-3 TPU measurement queue: re-measure every per-problem table with the
# loop-embedded timing methodology (pure device time — the dispatch-chain
# form pays ~1.5 ms/link of tunnel dispatch that marginal rates do not
# cancel; benchmarks/profile_solver_gap.py) and the MFU / FLOPs /
# compile-time-memory columns added in benchmarks/run.py.
#
# Run serially, ONE process at a time (two concurrent TPU processes wedge
# the tunnel). Each line is restartable — results JSONs merge per problem.
set -x
cd "$(dirname "$0")/.."

# small problems first: cheap compiles, and they validate the loop path
python benchmarks/run.py --problem mnist_mlp
python benchmarks/run.py --problem cifar10_resnet18
python benchmarks/run.py --problem cifar10_resnet18 --ops held_ggn,held_hessian
python benchmarks/run.py --problem cifar10_resnet18 --dtype bfloat16 --ops forward,gradient,hessian,ggn

# the two weak-MFU problems (VERDICT item 4): fp32 + bf16 rows with stats
python benchmarks/run.py --problem imagenet_resnet50
python benchmarks/run.py --problem imagenet_resnet50 --dtype bfloat16 --ops forward,gradient,hessian,ggn
python benchmarks/run.py --problem shakespeare_nanogpt
python benchmarks/run.py --problem shakespeare_nanogpt --dtype bfloat16 --ops forward,gradient,hessian,ggn
