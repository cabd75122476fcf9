"""Shared model utilities: initializers and problem containers."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclass
class Problem:
    """A benchmark problem: functional model + loss + params + one data batch.

    ``kfac_model_fn``/``kfac_params`` restrict to KFAC-supported parameters
    (dense/conv weights and biases with all dims <= 50k, mirroring the
    reference benchmark's selection, ``benchmark_execute.py:171-183``) with
    the remaining parameters closed over.
    """

    name: str
    model_fn: Callable
    loss_fn: Any
    params: Any
    data: list
    kfac_model_fn: Callable | None = None
    kfac_params: Any = None


def he_normal(key, shape, fan_in, dtype=jnp.float32):
    """He-normal initialization."""
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_in)


def lecun_normal(key, shape, fan_in, dtype=jnp.float32):
    """LeCun-normal initialization."""
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(1.0 / fan_in)
