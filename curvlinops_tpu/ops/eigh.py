"""Eigendecomposed linear operator ``Q diag(lam) Q^T``.

Counterpart of the reference ``EighDecomposedLinearOperator``
(``curvlinops/eigh.py:12-177``). ``Q`` may be a dense matrix or any
``LinearOperator`` on flat vectors (EKFAC stores the Kronecker product of the
per-factor eigenvector bases here). Closed-form trace/det/logdet/Frobenius
from the eigenvalues; damped inverse reuses ``Q`` with ``1 / (lam + delta)``.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import LinearOperator


class EighDecomposedLinearOperator(LinearOperator):
    """Operator ``Q diag(eigenvalues) Q^T`` with settable eigenvalues."""

    SELF_ADJOINT = True

    def __init__(self, eigenvalues: jax.Array, Q: Union[jax.Array, LinearOperator]):
        eigenvalues = jnp.asarray(eigenvalues)
        if eigenvalues.ndim != 1:
            raise ValueError("Eigenvalues must be a vector.")
        n = eigenvalues.shape[0]
        if isinstance(Q, LinearOperator):
            if Q.shape != (n, n):
                raise ValueError(f"Q has shape {Q.shape}, expected {(n, n)}.")
        else:
            Q = jnp.asarray(Q)
            if Q.shape != (n, n):
                raise ValueError(f"Q has shape {Q.shape}, expected {(n, n)}.")
        super().__init__(jax.ShapeDtypeStruct((n,), eigenvalues.dtype))
        self._eigenvalues = eigenvalues
        self._Q = Q
        self._Q_adj = None  # lazily cached operator adjoint (see _matmat)

    @property
    def eigenvalues(self) -> jax.Array:
        """The eigenvalues."""
        return self._eigenvalues

    @eigenvalues.setter
    def eigenvalues(self, value: jax.Array) -> None:
        value = jnp.asarray(value)
        if value.shape != self._eigenvalues.shape:
            raise ValueError(
                f"Eigenvalues must have shape {self._eigenvalues.shape}."
            )
        self._eigenvalues = value
        self.invalidate_traced()

    @property
    def Q(self):
        """The eigenvector basis (matrix or operator)."""
        return self._Q

    def _matmat(self, M: jax.Array) -> jax.Array:
        if isinstance(self._Q, LinearOperator):
            # cache the adjoint: for a Kronecker Q (the EKFAC case) every
            # adjoint() call would re-materialize conj-transposed copies of
            # all eigenvector factors
            if self._Q_adj is None:
                self._Q_adj = self._Q.adjoint()
            W = self._Q_adj._matmat(M)
            W = self._eigenvalues[:, None] * W
            return self._Q._matmat(W)
        W = self._Q.conj().T @ M
        W = self._eigenvalues[:, None] * W
        return self._Q @ W

    # closed-form properties (eigh.py:125-163)
    def trace(self) -> jax.Array:
        """Exact trace ``sum(lam)``."""
        return jnp.sum(self._eigenvalues)

    def det(self) -> jax.Array:
        """Exact determinant ``prod(lam)``."""
        return jnp.prod(self._eigenvalues)

    def logdet(self) -> jax.Array:
        """Exact log-determinant ``sum(log lam)``."""
        return jnp.sum(jnp.log(self._eigenvalues))

    def frobenius_norm(self) -> jax.Array:
        """Exact Frobenius norm ``sqrt(sum(lam^2))``."""
        return jnp.sqrt(jnp.sum(self._eigenvalues**2))

    def inverse(self, damping: float = 0.0) -> "EighDecomposedLinearOperator":
        """Damped inverse ``Q diag(1/(lam + delta)) Q^T`` (eigh.py:165-177)."""
        return EighDecomposedLinearOperator(
            1.0 / (self._eigenvalues + damping), self._Q
        )
