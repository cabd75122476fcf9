"""Random probe vectors for stochastic estimators.

Counterpart of ``curvlinops/sampling.py`` with explicit key threading.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

_DEFAULT_KEY_COUNTER = itertools.count()


def next_default_key(key: jax.Array | None = None) -> jax.Array:
    """``key`` if given, else the next key in a per-process sequence.

    A FIXED default key would make repeated estimator calls perfectly
    correlated — ``mean([hutchinson_trace(A, 10) for _ in range(100)])``
    would carry the variance of ONE draw. The reference's torch
    implementations pull from the global RNG so repeats differ and
    averaging reduces variance; the fold-in counter mirrors that while
    keeping each process run reproducible (the sequence restarts at 0).
    """
    if key is not None:
        return key
    return jax.random.fold_in(jax.random.key(0), next(_DEFAULT_KEY_COUNTER))


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
