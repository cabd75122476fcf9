"""Diagonal linear operator over a pytree space.

Counterpart of the reference ``DiagonalLinearOperator`` (``curvlinops/diag.py:11-163``):
elementwise multiplication per leaf; closed under ``+``, ``@``, scalar ``*``
(all return ``DiagonalLinearOperator``); damped inverse ``1 / (d + delta)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import LinearOperator
from curvlinops_tpu.utils.flatten import spec_of


class DiagonalLinearOperator(LinearOperator):
    """Operator ``diag(d)`` where ``d`` is a pytree matching the space."""

    SELF_ADJOINT = True

    def __init__(self, diagonal: Any):
        """Store the diagonal as a pytree of arrays."""
        self._diag = jax.tree.map(jnp.asarray, diagonal)
        super().__init__(spec_of(self._diag))

    @property
    def diagonal(self) -> Any:
        """The pytree of diagonal entries."""
        return self._diag

    def _matmat(self, M: Any) -> Any:
        return jax.tree.map(lambda d, m: d[..., None] * m, self._diag, M)

    def __add__(self, other):
        if isinstance(other, DiagonalLinearOperator):
            return DiagonalLinearOperator(
                jax.tree.map(jnp.add, self._diag, other._diag)
            )
        return super().__add__(other)

    def __mul__(self, scalar):
        if isinstance(scalar, (int, float)) or (
            hasattr(scalar, "ndim") and jnp.ndim(scalar) == 0
        ):
            return DiagonalLinearOperator(
                jax.tree.map(lambda d: scalar * d, self._diag)
            )
        return super().__mul__(scalar)

    __rmul__ = __mul__

    def __matmul__(self, other):
        if isinstance(other, DiagonalLinearOperator):
            return DiagonalLinearOperator(
                jax.tree.map(jnp.multiply, self._diag, other._diag)
            )
        return super().__matmul__(other)

    def inverse(self, damping: float = 0.0) -> "DiagonalLinearOperator":
        """Damped inverse ``diag(1 / (d + damping))`` (``diag.py:81``)."""
        return DiagonalLinearOperator(
            jax.tree.map(lambda d: 1.0 / (d + damping), self._diag)
        )

    # closed-form matrix properties
    def trace(self) -> jax.Array:
        """Exact trace."""
        leaves = [jnp.sum(d) for d in jax.tree.leaves(self._diag)]
        return sum(leaves[1:], leaves[0])

    def det(self) -> jax.Array:
        """Exact determinant."""
        leaves = [jnp.prod(d) for d in jax.tree.leaves(self._diag)]
        out = leaves[0]
        for leaf in leaves[1:]:
            out = out * leaf
        return out

    def logdet(self) -> jax.Array:
        """Exact log-determinant (requires positive diagonal)."""
        leaves = [jnp.sum(jnp.log(d)) for d in jax.tree.leaves(self._diag)]
        return sum(leaves[1:], leaves[0])

    def frobenius_norm(self) -> jax.Array:
        """Exact Frobenius norm."""
        leaves = [jnp.sum(d**2) for d in jax.tree.leaves(self._diag)]
        return jnp.sqrt(sum(leaves[1:], leaves[0]))
