"""Generalized Gauss-Newton (and Monte-Carlo Fisher) linear operator.

Counterpart of the reference ``GGNLinearOperator`` (``curvlinops/ggn.py:171-366``).

The exact per-batch GGN-VP is composed exactly as the reference does
(``ggn.py:41-74``) but with JAX transforms inside one jitted kernel:

1. ``jax.jvp`` of the model: ``v -> Jv``
2. ``jax.jvp`` of the loss gradient w.r.t. the prediction: ``Jv -> H_loss Jv``
3. ``jax.vjp`` of the model: ``H_loss Jv -> J^T H_loss Jv``

The forward pass appears in both jvp and vjp; XLA's CSE removes the duplicate
(the torch reference relies on ``torch.compile`` for the same effect,
``ggn.py:68-69``).

With ``mc_samples > 0`` the exact loss Hessian is replaced by
``sum_k g_k g_k^T`` with sampled grad-output vectors (MC Fisher); the sampled
vectors already carry the ``1/sqrt(M)`` and per-feature reduction scalings
(see :mod:`curvlinops_tpu.curvature.loss_hessian`). Randomness is explicit
key-threading: the operator's seed is folded with the batch index, so chained
operators see identical samples — the determinism the reference gets from
``fork_rng`` + ``manual_seed`` (``ggn.py:323-341``).

Example:
    >>> import jax, jax.numpy as jnp
    >>> from curvlinops_tpu import GGNLinearOperator, HessianLinearOperator
    >>> from curvlinops_tpu.losses import MSELoss
    >>> W = jax.random.normal(jax.random.key(0), (3, 5))
    >>> X = jax.random.uniform(jax.random.key(1), (8, 5))
    >>> y = jax.random.uniform(jax.random.key(2), (8, 3))
    >>> model_fn = lambda params, x: x @ params["W"].T
    >>> args = (model_fn, MSELoss("mean"), {"W": W}, [(X, y)])
    >>> G, H = GGNLinearOperator(*args), HessianLinearOperator(*args)
    >>> v = jax.random.normal(jax.random.key(3), (15,))
    >>> # for a LINEAR model the GGN equals the Hessian
    >>> bool(jnp.allclose(G @ v, H @ v, atol=1e-5))
    True
    >>> # MC Fisher: sampled grad-outputs, deterministic across matvecs
    >>> F = GGNLinearOperator(*args, mc_samples=8, seed=0,
    ...                       check_deterministic=False)
    >>> bool(jnp.allclose(F @ v, F @ v))
    True
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.curvature.loss_hessian import (
    FisherType,
    make_grad_output_fn,
    mean_rescale,
)
from curvlinops_tpu.risk import CurvatureLinearOperator
from curvlinops_tpu.utils.flatten import tree_scale, vmap_columns


def make_batch_ggn_matmat(
    model_fn: Callable, loss_fn: Callable, max_vmap_columns: int | None = None
) -> Callable:
    """Build the pure per-batch exact-GGN matmat kernel."""

    def batch_matmat(params: Any, X: Any, y: Any, M: Any, c, key) -> Any:
        del key
        c = c.astype(jax.tree.leaves(M)[0].dtype) if hasattr(c, 'astype') else c

        def f(p):
            return model_fn(p, X)

        # linearize once: the forward pass and its residuals are shared by
        # the JVP and its transpose across ALL matmat columns (vs. one
        # forward per column with a jvp/vjp pair)
        pred, jvp_fn = jax.linearize(f, params)
        vjp_fn = jax.linear_transpose(jvp_fn, params)
        loss_grad = jax.grad(lambda q: loss_fn(q, y))

        def ggnvp(v: Any) -> Any:
            jv = jvp_fn(v)
            _, hjv = jax.jvp(loss_grad, (pred,), (jv,))
            return vjp_fn(hjv)[0]

        GM = vmap_columns(ggnvp, M, max_vmap_columns)
        return tree_scale(c, GM)

    return batch_matmat


def make_batch_ggn_mc_matmat(
    model_fn: Callable,
    loss_fn: Callable,
    mc_samples: int,
    max_vmap_columns: int | None = None,
) -> Callable:
    """Build the per-batch MC-Fisher matmat kernel.

    Implements ``J^T (sum_{n,k} g_nk g_nk^T / c_batch) J v`` with sampled
    grad-output vectors, matching the pseudo-loss construction of the
    reference (``ggn.py:100-168``) without materializing a pseudo-loss:
    the middle factor is applied directly as two einsums.
    """
    grad_output_fn = make_grad_output_fn(loss_fn, FisherType.MC, mc_samples)

    def batch_matmat(params: Any, X: Any, y: Any, M: Any, c, key) -> Any:
        c = c.astype(jax.tree.leaves(M)[0].dtype) if hasattr(c, 'astype') else c

        def f(p):
            return model_fn(p, X)

        # one linearized forward shared by all columns
        pred, jvp_fn = jax.linearize(f, params)
        vjp_fn = jax.linear_transpose(jvp_fn, params)
        batch_size = jax.tree.leaves(pred)[0].shape[0]
        keys = jax.random.split(key, batch_size)
        # [N, V, *out] sampled grad-output vectors (already 1/sqrt(M)-scaled)
        G = jax.vmap(grad_output_fn)(jax.lax.stop_gradient(pred), y, keys)
        # batch-dim reduction: the loss averages over the batch for 'mean';
        # mean_rescale converts the static loss-term count to the true
        # masked-loss denominator under CE ignore_index (1 when unpadded)
        c_batch = float(batch_size) if loss_fn.reduction == "mean" else 1.0
        c_batch = c_batch / mean_rescale(loss_fn, y)

        def fishervp(v: Any) -> Any:
            jv = jvp_fn(v)
            # coeff[n, k] = <g_nk, (Jv)_n>
            coeff = jnp.einsum(
                "nk...,n...->nk", G, jv.astype(G.dtype)
            )
            tangent = jnp.einsum("nk...,nk->n...", G, coeff) / c_batch
            return vjp_fn(tangent.astype(jnp.result_type(jv)))[0]

        GM = vmap_columns(fishervp, M, max_vmap_columns)
        return tree_scale(c, GM)

    return batch_matmat


class GGNLinearOperator(CurvatureLinearOperator):
    r"""Matrix-free GGN ``c sum_n J_n^T (nabla^2_f ell) J_n`` of the empirical risk.

    Args:
        mc_samples: ``0`` (default) for the exact GGN; ``> 0`` replaces the
            loss Hessian by a Monte-Carlo estimate from that many sampled
            grad-output vectors per datum (MC Fisher).

    All other arguments as :class:`curvlinops_tpu.risk.EmpiricalRiskOperator`.
    """

    SELF_ADJOINT = True

    def __init__(self, model_fn, loss_fn, params, data, *, mc_samples: int = 0, **kw):
        self._mc_samples = mc_samples
        if mc_samples > 0:
            # per-batch MC samples must replay identically across matvecs
            self.FIXED_DATA_ORDER = True
            self.USES_RANDOMNESS = True
        super().__init__(model_fn, loss_fn, params, data, **kw)

    def _make_batch_matmat_with(self, model_fn) -> Callable:
        if self._mc_samples > 0:
            return make_batch_ggn_mc_matmat(
                model_fn,
                self._loss_fn,
                self._mc_samples,
                self._max_vmap_columns,
            )
        return make_batch_ggn_matmat(
            model_fn, self._loss_fn, self._max_vmap_columns
        )
