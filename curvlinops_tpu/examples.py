"""Dense ground-truth builders and verification helpers (semi-public).

Counterpart of ``curvlinops/examples/`` (``functorch.py:36-377``,
``__init__.py:21-247``): autodiff-built dense curvature matrices on the
concatenated dataset, used by docs and tests to verify the matrix-free
operators. Everything works on flattened parameters via
``jax.flatten_util.ravel_pytree``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from curvlinops_tpu.curvature.ef import flatten_prediction, flatten_target
from curvlinops_tpu.losses import CrossEntropyLoss
from curvlinops_tpu.risk import default_batch_size


def total_loss_fn(
    model_fn: Callable, loss_fn: Callable, data, batch_size_fn=None
) -> Callable:
    """Build ``params -> empirical risk`` with the operators' normalization."""
    batch_size_fn = batch_size_fn or default_batch_size
    N = sum(batch_size_fn(X) for X, _ in data)

    def total_loss(params):
        acc = 0.0
        for X, y in data:
            c = batch_size_fn(X) / N if loss_fn.reduction == "mean" else 1.0
            acc = acc + c * loss_fn(model_fn(params, X), y)
        return acc

    return total_loss


def gradient_and_loss(
    model_fn: Callable, loss_fn: Callable, params: Any, data, batch_size_fn=None
) -> tuple[Any, jax.Array]:
    """Reference gradient and loss over the dataset (``examples/__init__.py:21``)."""
    total = total_loss_fn(model_fn, loss_fn, data, batch_size_fn)
    loss, grad = jax.value_and_grad(total)(params)
    return grad, loss


def dense_hessian(model_fn, loss_fn, params, data, batch_size_fn=None) -> np.ndarray:
    """Dense Hessian of the empirical risk w.r.t. flattened parameters."""
    flat, unravel = ravel_pytree(params)
    total = total_loss_fn(model_fn, loss_fn, data, batch_size_fn)
    return np.asarray(jax.hessian(lambda v: total(unravel(v)))(flat))


def dense_ggn(model_fn, loss_fn, params, data, batch_size_fn=None) -> np.ndarray:
    """Dense generalized Gauss-Newton: per-batch ``J^T H_loss J`` summed."""
    batch_size_fn = batch_size_fn or default_batch_size
    N = sum(batch_size_fn(X) for X, _ in data)
    flat, unravel = ravel_pytree(params)
    G = np.zeros((flat.size, flat.size), dtype=np.float64)
    for X, y in data:
        c = batch_size_fn(X) / N if loss_fn.reduction == "mean" else 1.0

        def flat_pred(v):
            return model_fn(unravel(v), X).reshape(-1)

        J = np.asarray(jax.jacobian(flat_pred)(flat))
        pred_shape = jax.eval_shape(model_fn, params, X).shape

        def loss_of_pred(pf):
            return loss_fn(pf.reshape(pred_shape), y)

        Hl = np.asarray(jax.hessian(loss_of_pred)(jnp.asarray(flat_pred(flat))))
        G += c * (J.T @ Hl @ J)
    return G


def dense_empirical_fisher(
    model_fn, loss_fn, params, data, batch_size_fn=None
) -> np.ndarray:
    """Dense empirical Fisher, matching ``examples/functorch.py:190-267``.

    One gradient row per loss term (CE) or per summed feature group (MSE/BCE,
    with a ``1/sqrt(C)`` rescale under mean reduction); ``EF = J^T J / norm``.
    """
    flat, unravel = ravel_pytree(params)
    Xs = [X for X, _ in data]
    ys = [y for _, y in data]
    X_all = jax.tree.map(lambda *leaves: jnp.concatenate(leaves), *Xs)
    y_all = jnp.concatenate(ys)

    def rows(v):
        return flatten_prediction(loss_fn, model_fn(unravel(v), X_all))

    pred_rows = rows(flat)
    y_rows = flatten_target(loss_fn, y_all)
    L, C = pred_rows.shape

    if isinstance(loss_fn, CrossEntropyLoss):

        def row_loss(v, i):
            logp = jax.nn.log_softmax(rows(v)[i])
            return -logp[y_rows[i]]

        J = np.stack([np.asarray(jax.grad(row_loss)(flat, i)) for i in range(L)])
        norm = float(L) if loss_fn.reduction == "mean" else 1.0
    else:
        is_bce = type(loss_fn).__name__.startswith("BCE")

        def row_loss(v, i):
            p = rows(v)[i]
            if is_bce:
                x, t = p, y_rows[i]
                return jnp.sum(
                    jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
                )
            return jnp.sum((p - y_rows[i]) ** 2)

        J = np.stack([np.asarray(jax.grad(row_loss)(flat, i)) for i in range(L)])
        if loss_fn.reduction == "mean":
            J = J / np.sqrt(C)
        norm = float(L) if loss_fn.reduction == "mean" else 1.0

    return J.T @ J / norm


def dense_jacobian(model_fn, params, data) -> np.ndarray:
    """Dense Jacobian of concatenated flattened predictions w.r.t. flat params."""
    flat, unravel = ravel_pytree(params)
    blocks = []
    for X, _ in data:

        def flat_pred(v):
            return model_fn(unravel(v), X).reshape(-1)

        blocks.append(np.asarray(jax.jacobian(flat_pred)(flat)))
    return np.concatenate(blocks, axis=0)
