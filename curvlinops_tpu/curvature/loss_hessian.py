"""Closed-form loss-Hessian structure: square roots and grad-output samplers.

TPU-native counterpart of the reference's loss-Hessian toolbox
(``curvlinops/ggn_utils.py:29-376``). For each supported loss the Hessian
w.r.t. the prediction of ONE datum factorizes as ``S S^T``; this module
provides

- ``loss_hessian_sqrt_columns``: the columns of ``S`` (TYPE2 Fisher),
- ``sample_grad_outputs``: Monte-Carlo vectors ``g`` with ``E[g g^T] = S S^T``,
- ``empirical_grad_output``: the per-datum loss gradient (empirical Fisher),
- ``make_grad_output_fn``: the unified dispatcher used by GGN-MC / GGN-diagonal
  / KFAC factor computation.

All functions operate on a single datum (no batch axis) and are pure, so they
can be ``vmap``-ed over the batch and fused by XLA. Randomness is explicit
``jax.random`` key threading (strictly more deterministic than the reference's
global-RNG forking, ``ggn.py:323-341``).

The per-datum reduction constant follows ``ggn_utils.py:120-127``: with
``reduction='mean'`` the loss also averages over the datum's non-class
dimensions, contributing ``c = 1/num_features``; the batch-dimension averaging
is handled by the operator-level normalization factor.
"""

from __future__ import annotations

import math
from enum import Enum
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.losses import BCEWithLogitsLoss, CrossEntropyLoss, MSELoss


class FisherType(str, Enum):
    """Which curvature proxy the grad-output vectors realize (``kfac_utils.py:39``)."""

    TYPE2 = "type-2"
    MC = "mc"
    EMPIRICAL = "empirical"
    FORWARD_ONLY = "forward-only"


class KFACType(str, Enum):
    """Weight-sharing treatment in KFAC (``kfac_utils.py:63``)."""

    EXPAND = "expand"
    REDUCE = "reduce"


def mean_rescale(loss_fn, y: jax.Array):
    """``static_terms / non_ignored_count`` for mean-reduced CE, else 1.

    The closed-form TYPE2/MC grad-output machinery scales by the STATIC
    loss-term count (one term per target entry); torch's CE mean divides by
    the NON-ignored count. Multiplying a batch's Fisher/ggT contribution by
    this factor (linear, since the loss Hessian is linear in the loss
    scale) converts the static convention to the true masked-loss one —
    exactly 1 when no targets are padded.
    """
    if not (
        isinstance(loss_fn, CrossEntropyLoss) and loss_fn.reduction == "mean"
    ):
        return 1.0
    shape = jnp.shape(y)
    total = float(np.prod(shape)) if shape else 1.0
    count = jnp.maximum(jnp.sum(y != loss_fn.ignore_index), 1)
    return total / count.astype(jnp.float32)


def _feature_constant(loss_fn, output: jax.Array) -> float:
    """Per-datum reduction constant ``c`` (1 for sum, 1/num_features for mean)."""
    if isinstance(loss_fn, CrossEntropyLoss):
        num_features = output.size // output.shape[0]
    else:
        num_features = output.size
    return {"sum": 1.0, "mean": 1.0 / num_features}[loss_fn.reduction]


def loss_hessian_sqrt_columns(
    loss_fn, output: jax.Array, target: jax.Array
) -> jax.Array:
    r"""Columns of ``S`` with ``S S^T = nabla^2_f loss(f, y)`` for one datum.

    Args:
        loss_fn: MSE / CE / BCE loss.
        output: Prediction for one datum: ``[C, *D]`` for CE, ``[*D]`` otherwise.
        target: Label for the datum (no batch axis).

    Returns:
        ``[V, *output.shape]`` with ``V = output.size`` — the TYPE2 grad-output
        vectors.
    """
    c = _feature_constant(loss_fn, output)
    shape = output.shape
    n = output.size

    if isinstance(loss_fn, MSELoss):
        cols = math.sqrt(2 * c) * jnp.eye(n, dtype=output.dtype)
        return cols.reshape(n, *shape)

    if isinstance(loss_fn, BCEWithLogitsLoss):
        p = jax.nn.sigmoid(output.reshape(-1))
        cols = jnp.diag(math.sqrt(c) * jnp.sqrt(p * (1 - p)))
        return cols.reshape(n, *shape)

    if isinstance(loss_fn, CrossEntropyLoss):
        C = shape[0]
        D = n // C
        p = jax.nn.softmax(output.reshape(C, D), axis=0)  # [C, D]

        def per_position(p_t: jax.Array) -> jax.Array:
            # S_t = sqrt(c) (diag(sqrt(p)) - sqrt(p) p^T)
            p_sqrt = jnp.sqrt(p_t)
            return math.sqrt(c) * (jnp.diag(p_sqrt) - jnp.outer(p_sqrt, p_t)).T

        S = jax.vmap(per_position, in_axes=1)(p)  # [D, C_row, C_col]
        # ignored positions (target == ignore_index) have zero loss Hessian
        mask = (target != loss_fn.ignore_index).reshape(-1)
        S = S * mask[:, None, None].astype(output.dtype)
        # Column (c2, t2) has support only at position t2:
        # G[v=(c2, t2), c, t] = S_t[c, c2] * delta(t, t2)
        eye_D = jnp.eye(D, dtype=output.dtype)
        cols = jnp.einsum("tcv,ts->vsct", S, eye_D)  # [C_col, D_col, C, D]
        return cols.reshape(n, *shape)

    raise NotImplementedError(f"Loss {type(loss_fn).__name__} not supported.")


def sample_grad_outputs(
    loss_fn, output: jax.Array, target: jax.Array, key: jax.Array, num_samples: int
) -> jax.Array:
    r"""Draw MC grad-output vectors with ``E[g g^T] = nabla^2_f loss`` (one datum).

    Returns:
        ``[num_samples, *output.shape]`` (NOT yet scaled by ``1/sqrt(M)``).
    """
    c = _feature_constant(loss_fn, output)
    shape = output.shape

    if isinstance(loss_fn, MSELoss):
        return math.sqrt(2 * c) * jax.random.normal(
            key, (num_samples, *shape), output.dtype
        )

    if isinstance(loss_fn, BCEWithLogitsLoss):
        p = jax.nn.sigmoid(output)
        draws = jax.random.bernoulli(key, p, (num_samples, *shape))
        return math.sqrt(c) * (p - draws.astype(output.dtype))

    if isinstance(loss_fn, CrossEntropyLoss):
        C = shape[0]
        D = output.size // C
        logits = output.reshape(C, D)
        p = jax.nn.softmax(logits, axis=0)
        draws = jax.random.categorical(
            key, logits.T[None, :, :], axis=-1, shape=(num_samples, D)
        )  # [M, D] class indices
        onehot = jax.nn.one_hot(draws, C, dtype=output.dtype)  # [M, D, C]
        g = math.sqrt(c) * (p.T[None] - onehot)  # [M, D, C]
        # ignored positions (target == ignore_index) have zero loss Hessian
        mask = (target != loss_fn.ignore_index).reshape(-1)
        g = g * mask[None, :, None].astype(output.dtype)
        return jnp.moveaxis(g, -1, 1).reshape(num_samples, *shape)

    raise NotImplementedError(f"Loss {type(loss_fn).__name__} not supported.")


def empirical_grad_output(loss_fn, output: jax.Array, target: jax.Array) -> jax.Array:
    r"""Per-datum loss gradient for the empirical Fisher (``ggn_utils.py:316-349``).

    For mean-reduced MSE/BCE the single-datum loss carries an extra ``1/C``
    feature average; it is rescaled by ``sqrt(C)`` so the outer product
    contributes ``g g^T / C`` as the EF requires.

    Returns:
        ``[1, *output.shape]``.
    """

    def datum_loss(f):
        f1 = f[None]
        y1 = target[None]
        return loss_fn(f1, y1)

    scale = 1.0
    if isinstance(loss_fn, (MSELoss, BCEWithLogitsLoss)) and (
        loss_fn.reduction == "mean"
    ):
        scale = math.sqrt(output.size)
    g = jax.grad(datum_loss)(output)
    return (scale * g)[None]


def make_grad_output_fn(
    loss_fn, fisher_type: FisherType, mc_samples: int = 1
) -> Callable[[jax.Array, jax.Array, jax.Array], jax.Array]:
    """Unified per-datum grad-output dispatcher (``ggn_utils.py:274-376``).

    Returns:
        ``(output, target, key) -> [V, *output.shape]`` with
        ``V = output.size`` (TYPE2), ``mc_samples`` (MC, scaled ``1/sqrt(M)``),
        ``1`` (EMPIRICAL), or ``0`` (FORWARD_ONLY).
    """
    fisher_type = FisherType(fisher_type)

    if fisher_type == FisherType.TYPE2:
        return lambda out, y, key: loss_hessian_sqrt_columns(loss_fn, out, y)
    if fisher_type == FisherType.MC:
        scale = 1.0 / math.sqrt(mc_samples)
        return lambda out, y, key: scale * sample_grad_outputs(
            loss_fn, out, y, key, mc_samples
        )
    if fisher_type == FisherType.EMPIRICAL:
        return lambda out, y, key: empirical_grad_output(loss_fn, out, y)
    # FORWARD_ONLY
    return lambda out, y, key: jnp.zeros((0, *out.shape), out.dtype)
