"""Stochastic squared-Frobenius-norm estimation.

Counterpart of ``curvlinops/norm/hutchinson.py``: ``||A||_F^2 = tr(A^T A)``
estimated as ``sum((A G)^2) / N``; wide operators are transposed first so the
probes live in the smaller space (``norm/hutchinson.py:65-73``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from curvlinops_tpu.estimators.sampling import next_default_key, random_matrix


def hutchinson_squared_fro(
    A,
    num_matvecs: int,
    distribution: str = "rademacher",
    key: jax.Array | None = None,
) -> jax.Array:
    """Estimate ``||A||_F^2`` with ``num_matvecs`` probe products."""
    rows, cols = A.shape
    if num_matvecs >= min(rows, cols):
        raise ValueError(
            f"num_matvecs ({num_matvecs}) must be smaller than the smallest "
            f"dimension of {A.shape}."
        )
    if rows < cols:
        # plain arrays have no .adjoint (unlike torch Tensors)
        A = A.adjoint() if hasattr(A, "adjoint") else jnp.asarray(A).T.conj()
        rows, cols = cols, rows
    key = next_default_key(key)
    G = random_matrix(key, cols, num_matvecs, distribution, A.dtype)
    AG = A @ G
    return jnp.sum(AG**2) / num_matvecs
