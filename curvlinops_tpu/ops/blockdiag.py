"""Block-diagonal linear operator.

Counterpart of the reference ``BlockDiagonalLinearOperator``
(``curvlinops/blockdiagonal.py:19-189``): holds child operators, routes the
per-block slices of the input through each child, and reduces closed-form
matrix properties over the blocks. The input space is the tuple of the
children's input spaces, so flat vectors split automatically at the format
edge.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import LinearOperator


class BlockDiagonalLinearOperator(LinearOperator):
    """``blockdiag(A_1, ..., A_k)`` over a tuple of flat-vector spaces."""

    def __init__(self, blocks: Sequence[LinearOperator]):
        blocks = list(blocks)
        if not blocks:
            raise ValueError("Need at least one block.")
        in_spec = tuple(b.in_spec for b in blocks)
        out_spec = tuple(b.out_spec for b in blocks)
        super().__init__(in_spec, out_spec)
        self.blocks = blocks
        self.SELF_ADJOINT = all(b.SELF_ADJOINT for b in blocks)

    def __len__(self) -> int:  # noqa: D105
        return len(self.blocks)

    def __getitem__(self, idx: int) -> LinearOperator:  # noqa: D105
        return self.blocks[idx]

    def _matmat(self, M: tuple) -> tuple:
        # M is a tuple mirroring in_spec; route each component through its block
        out = []
        for block, component in zip(self.blocks, M):
            out.append(block._matmat(component))
        return tuple(out)

    def _adjoint(self) -> "BlockDiagonalLinearOperator":
        return BlockDiagonalLinearOperator([b.adjoint() for b in self.blocks])

    # ---- closed-form reductions over blocks (blockdiagonal.py:143-189) --- #
    def trace(self) -> jax.Array:
        """Sum of block traces."""
        parts = [b.trace() for b in self.blocks]
        return sum(parts[1:], parts[0])

    def det(self) -> jax.Array:
        """Product of block determinants."""
        out = self.blocks[0].det()
        for b in self.blocks[1:]:
            out = out * b.det()
        return out

    def logdet(self) -> jax.Array:
        """Sum of block log-determinants."""
        parts = [b.logdet() for b in self.blocks]
        return sum(parts[1:], parts[0])

    def frobenius_norm(self) -> jax.Array:
        """sqrt of summed squared block Frobenius norms."""
        parts = [b.frobenius_norm() ** 2 for b in self.blocks]
        return jnp.sqrt(sum(parts[1:], parts[0]))

    def inverse(self, **kwargs) -> "BlockDiagonalLinearOperator":
        """Blockwise inverse, forwarding damping options to each block."""
        return BlockDiagonalLinearOperator([b.inverse(**kwargs) for b in self.blocks])
