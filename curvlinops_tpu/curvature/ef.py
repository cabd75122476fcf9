"""Empirical Fisher (uncentered gradient covariance) linear operator.

Counterpart of the reference ``EFLinearOperator``
(``curvlinops/gradient_moments.py:15-151``). Semantics: with per-loss-term
predictions flattened to rows ``f_i`` (CE: ``[N, C, *d] -> [(N *d), C]``,
MSE/BCE: ``[N, *d, C] -> [(N *d), C]``; ``utils.py:327-400`` in the reference)
and unreduced row gradients ``g_i = nabla_{f_i} ell_i``, the batch EF is

    EF_batch = (1/R) J^T [ sum_i g_i g_i^T ] J,   R = L (CE) or L*C (MSE/BCE)

for mean reduction (``gradient_moments.py:70-78``), ``R = 1`` for sum, where
``L`` is the number of loss terms in the batch. Instead of the reference's
pseudo-loss + double-jvp construction, the middle factor is applied directly
with two einsums inside one jitted kernel — fewer transforms, same math.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.losses import (
    CrossEntropyLoss,
    MSELoss,
    SUPPORTED_LOSSES,
)
from curvlinops_tpu.risk import CurvatureLinearOperator
from curvlinops_tpu.utils.flatten import tree_scale, vmap_columns


def flatten_prediction(loss_fn, pred: jax.Array) -> jax.Array:
    """Flatten extra dims into the row axis: ``-> [num_loss_terms, C]``."""
    if isinstance(loss_fn, CrossEntropyLoss):
        # [N, C, *d] -> [N, *d, C] -> [(N *d), C]
        moved = jnp.moveaxis(pred, 1, -1) if pred.ndim > 2 else pred
        return moved.reshape(-1, moved.shape[-1])
    # MSE/BCE: [N, *d, C] -> [(N *d), C]; 1d predictions get a feature axis
    if pred.ndim == 1:
        return pred[:, None]
    return pred.reshape(-1, pred.shape[-1])


def flatten_target(loss_fn, y: jax.Array) -> jax.Array:
    """Flatten targets to match :func:`flatten_prediction` rows."""
    if isinstance(loss_fn, CrossEntropyLoss):
        return y.reshape(-1)
    if y.ndim == 1:
        return y[:, None]
    return y.reshape(-1, y.shape[-1])


def make_row_grad(loss_fn) -> Callable:
    """Vmapped per-row loss gradient ``[L, C] x [L, ...] -> [L, C]``."""
    if not isinstance(loss_fn, SUPPORTED_LOSSES):
        raise NotImplementedError(
            f"Loss must be one of {[c.__name__ for c in SUPPORTED_LOSSES]}, "
            f"got {type(loss_fn).__name__}."
        )

    def row_loss(f_row: jax.Array, y_row) -> jax.Array:
        """Unreduced loss of one flattened row (sum over its C features)."""
        if isinstance(loss_fn, CrossEntropyLoss):
            return CrossEntropyLoss("sum", loss_fn.ignore_index)(
                f_row[None], y_row[None]
            )
        if isinstance(loss_fn, MSELoss):
            return jnp.sum((f_row - y_row) ** 2)
        x = f_row
        return jnp.sum(jnp.maximum(x, 0) - x * y_row + jnp.log1p(jnp.exp(-jnp.abs(x))))

    return jax.vmap(jax.grad(row_loss))


def make_batch_ef_matmat(
    model_fn: Callable, loss_fn, max_vmap_columns: int | None = None
) -> Callable:
    """Build the pure per-batch empirical-Fisher matmat kernel."""
    row_grad = make_row_grad(loss_fn)

    def batch_matmat(params: Any, X: Any, y: Any, M: Any, c, key) -> Any:
        del key
        c = c.astype(jax.tree.leaves(M)[0].dtype) if hasattr(c, 'astype') else c

        def f_flat(p):
            return flatten_prediction(loss_fn, model_fn(p, X))

        y_flat = flatten_target(loss_fn, y)
        # one linearized forward shared by all columns
        pred_flat, jvp_fn = jax.linearize(f_flat, params)
        vjp_fn = jax.linear_transpose(jvp_fn, params)
        G = row_grad(jax.lax.stop_gradient(pred_flat), y_flat)  # [L, C] rows

        L, C = pred_flat.shape
        R = 1.0
        if loss_fn.reduction == "mean":
            if isinstance(loss_fn, CrossEntropyLoss):
                # the mean divides by the NON-ignored loss-term count
                # (== L when no targets are padded)
                R = jnp.maximum(
                    jnp.sum(y_flat != loss_fn.ignore_index), 1
                ).astype(pred_flat.dtype)
            else:
                R = float(L * C)

        def efvp(v: Any) -> Any:
            jv = jvp_fn(v)
            coeff = jnp.einsum("lc,lc->l", G, jv)
            tangent = (coeff[:, None] * G) / R
            return vjp_fn(tangent)[0]

        EM = vmap_columns(efvp, M, max_vmap_columns)
        return tree_scale(c, EM)

    return batch_matmat


class EFLinearOperator(CurvatureLinearOperator):
    r"""Matrix-free empirical Fisher ``c sum_n g_n g_n^T`` of the empirical risk."""

    SELF_ADJOINT = True

    def _make_batch_matmat_with(self, model_fn) -> Callable:
        return make_batch_ef_matmat(
            model_fn, self._loss_fn, self._max_vmap_columns
        )
