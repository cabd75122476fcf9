"""Submatrix of a linear operator: ``A[row_idxs][:, col_idxs]``.

Counterpart of the reference ``SubmatrixLinearOperator``
(``curvlinops/submatrix.py:10-105``): scatter the input into the full column
space, apply ``A``, gather the requested rows. Works matrix-free for any
operator; the adjoint swaps the index lists.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.ops.base import LinearOperator


def _validate_indices(idxs: Sequence[int], dim: int, name: str) -> np.ndarray:
    arr = np.asarray(idxs)
    if arr.ndim != 1 or arr.size == 0:
        raise ValueError(f"{name} must be a non-empty 1d sequence of ints.")
    if not np.issubdtype(arr.dtype, np.integer):
        raise ValueError(f"{name} must contain integers, got {arr.dtype}.")
    if len(np.unique(arr)) != len(arr):
        raise ValueError(f"{name} must not contain duplicates.")
    if arr.min() < 0 or arr.max() >= dim:
        raise ValueError(f"{name} out of range for dimension {dim}.")
    return arr


class SubmatrixLinearOperator(LinearOperator):
    """``A[row_idxs][:, col_idxs]`` as a matrix-free operator on flat vectors."""

    def __init__(self, A: LinearOperator, row_idxs, col_idxs):
        self._A = A
        self._row_idxs = jnp.asarray(
            _validate_indices(row_idxs, A.shape[0], "row_idxs")
        )
        self._col_idxs = jnp.asarray(
            _validate_indices(col_idxs, A.shape[1], "col_idxs")
        )
        dtype = A.dtype
        super().__init__(
            jax.ShapeDtypeStruct((self._col_idxs.shape[0],), dtype),
            jax.ShapeDtypeStruct((self._row_idxs.shape[0],), dtype),
        )

    def _matmat(self, M: jax.Array) -> jax.Array:
        K = M.shape[-1]
        full = jnp.zeros((self._A.shape[1], K), M.dtype)
        full = full.at[self._col_idxs].set(M)
        out = self._A @ full
        return out[self._row_idxs]

    def _adjoint(self) -> "SubmatrixLinearOperator":
        return SubmatrixLinearOperator(
            self._A.adjoint(), np.asarray(self._col_idxs), np.asarray(self._row_idxs)
        )
