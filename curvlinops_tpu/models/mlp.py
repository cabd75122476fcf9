"""MNIST-scale MLP benchmark problem.

Mirrors the reference's ``synthetic_mnist_mlp``
(``docs/examples/basic_usage/benchmark_utils.py:430-449``):
784-1024-512-256-128-64-10 ReLU MLP with cross-entropy, batch 512.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from curvlinops_tpu.losses import CrossEntropyLoss
from curvlinops_tpu.models.common import Problem, he_normal

SIZES = (784, 1024, 512, 256, 128, 64, 10)


def mlp_apply(params, x):
    """ReLU MLP forward pass ``[N, 784] -> [N, 10]``."""
    n = len(params)
    for i in range(n):
        layer = params[f"dense{i}"]
        x = x @ layer["W"] + layer["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def init_mlp(key, sizes=SIZES, dtype=jnp.float32):
    """Initialize the MLP parameter pytree."""
    params = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (k, d_in, d_out) in enumerate(zip(keys, sizes[:-1], sizes[1:])):
        params[f"dense{i}"] = {
            "W": he_normal(k, (d_in, d_out), d_in, dtype),
            "b": jnp.zeros(d_out, dtype),
        }
    return params


def mnist_mlp(batch_size: int = 512, seed: int = 0, dtype=jnp.float32) -> Problem:
    """Synthetic-MNIST MLP problem (batch of uniform pixels, random labels)."""
    key = jax.random.key(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_mlp(kp, dtype=dtype)
    X = jax.random.uniform(kx, (batch_size, 784), dtype)
    y = jax.random.randint(ky, (batch_size,), 0, 10)
    return Problem(
        name="synthetic_mnist_mlp",
        model_fn=mlp_apply,
        loss_fn=CrossEntropyLoss("mean"),
        params=params,
        data=[(X, y)],
        kfac_model_fn=mlp_apply,
        kfac_params=params,
    )
