"""Benchmark model zoo: MLP, ResNet-18/50, nanoGPT-class transformer, ViT.

Mirrors the reference's benchmark problems
(``docs/examples/basic_usage/benchmark_utils.py:341-449``) and adds a
Vision Transformer (conv patch embedding + dense attention blocks — both
KFAC layer kinds in one model), which the reference zoo lacks.
"""

from curvlinops_tpu.models.common import Problem
from curvlinops_tpu.models.gpt import (
    GPTConfig,
    TINY_GPT,
    gpt_apply,
    init_gpt,
    shakespeare_nanogpt,
)
from curvlinops_tpu.models.mlp import init_mlp, mlp_apply, mnist_mlp
from curvlinops_tpu.models.resnet import (
    cifar10_resnet18,
    imagenet_resnet50,
    init_resnet,
    kfac_restricted,
    resnet_apply,
)
from curvlinops_tpu.models.vit import (
    TINY_VIT,
    ViTConfig,
    cifar10_vit,
    init_vit,
    vit_apply,
)

PROBLEMS = {
    "synthetic_mnist_mlp": mnist_mlp,
    "synthetic_cifar10_resnet18": cifar10_resnet18,
    "synthetic_imagenet_resnet50": imagenet_resnet50,
    "synthetic_shakespeare_nanogpt": shakespeare_nanogpt,
    "synthetic_cifar10_vit": cifar10_vit,
}

__all__ = [
    "Problem",
    "PROBLEMS",
    "mnist_mlp",
    "cifar10_resnet18",
    "imagenet_resnet50",
    "shakespeare_nanogpt",
    "GPTConfig",
    "TINY_GPT",
    "mlp_apply",
    "init_mlp",
    "resnet_apply",
    "init_resnet",
    "gpt_apply",
    "init_gpt",
    "kfac_restricted",
    "cifar10_vit",
    "ViTConfig",
    "TINY_VIT",
    "vit_apply",
    "init_vit",
]
