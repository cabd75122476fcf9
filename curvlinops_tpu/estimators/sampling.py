"""Random probe vectors for stochastic estimators.

Counterpart of ``curvlinops/sampling.py`` with explicit key threading.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rademacher(key: jax.Array, shape: tuple, dtype=jnp.float32) -> jax.Array:
    """+-1 entries with equal probability."""
    return jax.random.rademacher(key, shape, dtype)


def normal(key: jax.Array, shape: tuple, dtype=jnp.float32) -> jax.Array:
    """Standard normal entries."""
    return jax.random.normal(key, shape, dtype)


def random_matrix(
    key: jax.Array, dim: int, num_cols: int, distribution: str, dtype=jnp.float32
) -> jax.Array:
    """``[dim, num_cols]`` of i.i.d. probes from the named distribution.

    Raises:
        ValueError: For an unknown distribution name.
    """
    if distribution == "rademacher":
        return rademacher(key, (dim, num_cols), dtype)
    if distribution == "normal":
        return normal(key, (dim, num_cols), dtype)
    raise ValueError(
        f"Unknown distribution {distribution!r}; use 'rademacher' or 'normal'."
    )
