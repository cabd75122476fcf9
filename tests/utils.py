"""Shared test utilities: dense ground truths and format-exhaustive checks.

JAX analogue of the reference's ``test/utils.py`` + ``curvlinops/examples/functorch.py``:
ground-truth curvature matrices come from ``jax.hessian`` / ``jax.jacobian`` on
flattened parameters over the concatenated dataset, and ``compare_matmat``
exercises every supported input/output format against the dense matrix.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from curvlinops_tpu.losses import CrossEntropyLoss
from curvlinops_tpu.risk import default_batch_size


def total_loss_fn(
    model_fn: Callable, loss_fn: Callable, data, batch_size_fn=None
) -> Callable:
    """Build ``params -> empirical risk`` with the reference's normalization."""
    batch_size_fn = batch_size_fn or default_batch_size
    N = sum(batch_size_fn(X) for X, _ in data)

    def total_loss(params):
        acc = 0.0
        for X, y in data:
            c = (
                batch_size_fn(X) / N
                if loss_fn.reduction == "mean"
                else 1.0
            )
            acc = acc + c * loss_fn(model_fn(params, X), y)
        return acc

    return total_loss


def dense_hessian(model_fn, loss_fn, params, data, batch_size_fn=None) -> np.ndarray:
    """Dense Hessian of the empirical risk w.r.t. flattened parameters."""
    flat, unravel = ravel_pytree(params)
    total = total_loss_fn(model_fn, loss_fn, data, batch_size_fn)
    H = jax.hessian(lambda v: total(unravel(v)))(flat)
    return np.asarray(H)

def dense_ggn(model_fn, loss_fn, params, data, batch_size_fn=None) -> np.ndarray:
    """Dense generalized Gauss-Newton: sum of per-batch J^T H_loss J."""
    batch_size_fn = batch_size_fn or default_batch_size
    N = sum(batch_size_fn(X) for X, _ in data)
    flat, unravel = ravel_pytree(params)
    G = np.zeros((flat.size, flat.size), dtype=np.float64)
    for X, y in data:
        c = batch_size_fn(X) / N if loss_fn.reduction == "mean" else 1.0

        def flat_pred(v):
            return model_fn(unravel(v), X).reshape(-1)

        J = np.asarray(jax.jacobian(flat_pred)(flat))
        pred_flat = np.asarray(flat_pred(flat))
        pred_shape = model_fn(params, X).shape

        def loss_of_pred(pf):
            return loss_fn(pf.reshape(pred_shape), y)

        Hl = np.asarray(jax.hessian(loss_of_pred)(jnp.asarray(pred_flat)))
        G += c * (J.T @ Hl @ J)
    return G


def dense_empirical_fisher(
    model_fn, loss_fn, params, data, batch_size_fn=None
) -> np.ndarray:
    """Dense empirical Fisher, matching ``examples/functorch.py:190-267`` semantics.

    Rows of the stacked per-loss-term gradient matrix: for CE one row per
    (example, sequence position); for MSE/BCE the per-element gradients of one
    loss term are summed over the feature axis (and divided by ``sqrt(C)`` for
    mean reduction). EF = ``J^T J / normalization``.
    """
    from curvlinops_tpu.curvature.ef import flatten_prediction, flatten_target
    from curvlinops_tpu.losses import CrossEntropyLoss

    flat, unravel = ravel_pytree(params)
    Xs = [X for X, _ in data]
    ys = [y for _, y in data]
    X_all = jax.tree.map(lambda *leaves: jnp.concatenate(leaves), *Xs)
    y_all = jnp.concatenate(ys)

    def rows(v):
        pred = flatten_prediction(loss_fn, model_fn(unravel(v), X_all))  # [L, C]
        return pred

    pred_rows = rows(flat)
    y_rows = flatten_target(loss_fn, y_all)
    L, C = pred_rows.shape

    if isinstance(loss_fn, CrossEntropyLoss):

        def row_loss(v, i):
            p = rows(v)[i]
            logp = jax.nn.log_softmax(p)
            return -logp[y_rows[i]]

        J = np.stack(
            [np.asarray(jax.grad(row_loss)(flat, i)) for i in range(L)]
        )  # [L, D]
        norm = float(L) if loss_fn.reduction == "mean" else 1.0
    else:

        def row_loss(v, i):
            p = rows(v)[i]
            if hasattr(loss_fn, "reduction") and type(loss_fn).__name__.startswith(
                "BCE"
            ):
                x, t = p, y_rows[i]
                return jnp.sum(
                    jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
                )
            return jnp.sum((p - y_rows[i]) ** 2)

        J = np.stack([np.asarray(jax.grad(row_loss)(flat, i)) for i in range(L)])
        if loss_fn.reduction == "mean":
            J = J / np.sqrt(C)
        norm = float(L * C) / C if loss_fn.reduction == "mean" else 1.0

    return J.T @ J / norm


def dense_jacobian(model_fn, params, data) -> np.ndarray:
    """Dense Jacobian of concatenated predictions w.r.t. flat params."""
    flat, unravel = ravel_pytree(params)
    blocks = []
    for X, _ in data:
        def flat_pred(v):
            return model_fn(unravel(v), X).reshape(-1)

        blocks.append(np.asarray(jax.jacobian(flat_pred)(flat)))
    return np.concatenate(blocks, axis=0)


def report_nonclose(a, b, rtol=1e-5, atol=1e-7, name="arrays"):
    """Assert allclose with a diff report."""
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, f"{name}: shape mismatch {a.shape} vs {b.shape}"
    if not np.allclose(a, b, rtol=rtol, atol=atol):
        bad = ~np.isclose(a, b, rtol=rtol, atol=atol)
        idx = np.argwhere(bad)[:10]
        msg = "\n".join(f"  {tuple(i)}: {a[tuple(i)]} vs {b[tuple(i)]}" for i in idx)
        maxdiff = np.abs(a - b).max()
        raise AssertionError(
            f"{name}: {bad.sum()}/{bad.size} entries differ (max {maxdiff}):\n{msg}"
        )


def compare_matmat(
    op, dense: np.ndarray, rtol: float = 1e-5, atol: float = 1e-7, num_cols: int = 3
):
    """Check every supported format of ``op @ ...`` / ``... @ op`` vs a dense matrix.

    Mirrors the reference's exhaustive harness (``test/utils.py:603-675``).
    """
    rng = np.random.default_rng(0)
    out_dim, in_dim = dense.shape
    assert op.shape == (out_dim, in_dim)

    x = rng.standard_normal(in_dim).astype(np.float32)
    X = rng.standard_normal((in_dim, num_cols)).astype(np.float32)

    # flat jax vector / matrix
    report_nonclose(op @ jnp.asarray(x), dense @ x, rtol, atol, "flat vec")
    report_nonclose(op @ jnp.asarray(X), dense @ X, rtol, atol, "flat mat")

    # numpy vector / matrix (returns numpy)
    out_np = op @ x
    assert isinstance(out_np, np.ndarray), "numpy input must give numpy output"
    report_nonclose(out_np, dense @ x, rtol, atol, "np vec")
    report_nonclose(op @ X, dense @ X, rtol, atol, "np mat")

    # pytree vector / pytree with columns
    _, unravel = ravel_pytree(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), op.in_spec)
    )
    v_tree = unravel(jnp.asarray(x))
    out_tree = op @ v_tree
    out_flat = ravel_pytree(out_tree)[0]
    report_nonclose(out_flat, dense @ x, rtol, atol, "tree vec")

    M_tree = jax.vmap(unravel, in_axes=1, out_axes=-1)(jnp.asarray(X))
    out_cols = op @ M_tree
    out_cols_flat = jax.vmap(
        lambda t: ravel_pytree(t)[0], in_axes=-1, out_axes=1
    )(out_cols)
    report_nonclose(out_cols_flat, dense @ X, rtol, atol, "tree mat")

    # left multiplication
    Y = rng.standard_normal((num_cols, out_dim)).astype(np.float32)
    report_nonclose(Y @ op, Y @ dense, rtol, atol, "left mat")

    # adjoint
    y1 = rng.standard_normal(out_dim).astype(np.float32)
    report_nonclose(op.adjoint() @ y1, dense.T @ y1, rtol, atol, "adjoint vec")


def compare_consecutive_matmats(op, rtol=1e-5, atol=1e-8):
    """Two identical matmats must agree (``test/utils.py:678-709``)."""
    rng = np.random.default_rng(1)
    X = rng.standard_normal((op.shape[1], 2)).astype(np.float32)
    report_nonclose(op @ X, op @ X, rtol, atol, "consecutive matmats")
