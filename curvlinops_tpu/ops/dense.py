"""Explicitly represented operators: dense matrix, identity, outer product.

TPU-native counterparts of the reference's example operators
(``curvlinops/examples/__init__.py:64,153,217``), promoted to the main package
because tests, estimators, and solvers use them.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import LinearOperator


def _vector_spec(dim: int, dtype) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct((dim,), dtype)


class MatrixLinearOperator(LinearOperator):
    """Wraps an explicit dense matrix ``A`` as an operator on flat vectors."""

    def __init__(self, A: jax.Array):
        A = jnp.asarray(A)
        if A.ndim != 2:
            raise ValueError(f"Expected a matrix, got shape {A.shape}.")
        super().__init__(
            _vector_spec(A.shape[1], A.dtype), _vector_spec(A.shape[0], A.dtype)
        )
        self.A = A

    def _matmat(self, M: Any) -> Any:
        return self.A @ M

    def _adjoint(self) -> "MatrixLinearOperator":
        return MatrixLinearOperator(self.A.conj().T)

    def todense(self, col_chunk=None) -> jax.Array:  # noqa: D102
        return self.A


class IdentityLinearOperator(LinearOperator):
    """Identity on an arbitrary pytree space."""

    SELF_ADJOINT = True

    def __init__(self, spec: Any):
        super().__init__(spec)

    def _matmat(self, M: Any) -> Any:
        return M


class OuterProductLinearOperator(LinearOperator):
    """Low-rank operator ``c * U U^T`` for ``U`` of shape ``[N, R]``."""

    SELF_ADJOINT = True

    def __init__(self, U: jax.Array, c: float = 1.0):
        U = jnp.asarray(U)
        if U.ndim == 1:
            U = U[:, None]
        super().__init__(_vector_spec(U.shape[0], U.dtype))
        self.U, self.c = U, c

    def _matmat(self, M: Any) -> Any:
        return self.c * (self.U @ (self.U.conj().T @ M))
