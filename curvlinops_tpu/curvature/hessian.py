"""Hessian of the empirical risk as a matrix-free linear operator.

Counterpart of the reference ``HessianLinearOperator``
(``curvlinops/hessian.py:73-145``). The per-batch kernel is forward-over-reverse
HVP — ``jax.jvp`` of ``jax.grad`` — vmapped over the K columns of the matmat,
all inside one jitted function so XLA fuses the two passes and keeps the MXU
busy across columns.

Example:
    >>> import jax, jax.numpy as jnp
    >>> from curvlinops_tpu import HessianLinearOperator
    >>> from curvlinops_tpu.losses import MSELoss
    >>> key = jax.random.key(0)
    >>> D_in, D_out, N = 4, 2, 10
    >>> W = jax.random.normal(key, (D_out, D_in))
    >>> X = jax.random.uniform(jax.random.key(1), (N, D_in))
    >>> y = jax.random.uniform(jax.random.key(2), (N, D_out))
    >>> model_fn = lambda params, x: x @ params["W"].T
    >>> data = [(X[:5], y[:5]), (X[5:], y[5:])]
    >>> H = HessianLinearOperator(
    ...     model_fn, MSELoss(reduction="sum"), {"W": W}, data
    ... )
    >>> # analytic Hessian of sum-MSE for a linear model: 2 I_Dout (x) X^T X
    >>> H_mat = 2 * jnp.kron(jnp.eye(D_out), X.T @ X)
    >>> v = jax.random.normal(jax.random.key(3), (D_in * D_out,))
    >>> bool(jnp.allclose(H_mat @ v, H @ v, atol=1e-5))
    True
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from curvlinops_tpu.risk import CurvatureLinearOperator
from curvlinops_tpu.utils.flatten import tree_scale, vmap_columns


def make_batch_hessian_matmat(
    model_fn: Callable, loss_fn: Callable, max_vmap_columns: int | None = None
) -> Callable:
    """Build the pure per-batch Hessian matmat kernel.

    Returns:
        ``(params, X, y, M, c, key) -> c * H_batch M`` where ``M`` carries a
        trailing column axis on every leaf.
    """

    def batch_matmat(params: Any, X: Any, y: Any, M: Any, c, key) -> Any:
        del key  # deterministic
        # keep the normalization scalar in the operand dtype (bf16-safe)
        c = c.astype(jax.tree.leaves(M)[0].dtype) if hasattr(c, 'astype') else c

        def batch_loss(p: Any):
            return loss_fn(model_fn(p, X), y)

        # linearize the gradient once: forward+backward residuals are shared
        # across ALL matmat columns (vs. one full fwd+bwd per column)
        _, hvp = jax.linearize(jax.grad(batch_loss), params)

        HM = vmap_columns(hvp, M, max_vmap_columns)
        return tree_scale(c, HM)

    return batch_matmat


class HessianLinearOperator(CurvatureLinearOperator):
    r"""Matrix-free Hessian :math:`\nabla^2_\theta \mathcal{L}` of the empirical risk."""

    SELF_ADJOINT = True

    def _make_batch_matmat_with(self, model_fn) -> Callable:
        return make_batch_hessian_matmat(
            model_fn, self._loss_fn, self._max_vmap_columns
        )
