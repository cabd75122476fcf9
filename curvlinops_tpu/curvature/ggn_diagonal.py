"""Exact (type-2) and Monte-Carlo GGN diagonal.

Counterpart of the reference ``GGNDiagonalLinearOperator``
(``curvlinops/ggn_diagonal.py:12-91`` + ``computers/ggn_diagonal.py:21-232``).

Per datum, the GGN diagonal contribution is ``sum_v (J_n^T g_nv)^2`` with
grad-output vectors ``g_nv`` (TYPE2 columns when ``mc_samples == 0``, MC
samples otherwise). The per-datum vjp is vmapped over both the grad-output
vectors and the batch inside one jitted kernel, and the result is materialized
as a :class:`curvlinops_tpu.ops.diagonal.DiagonalLinearOperator` — after the
one-time build, matvecs are elementwise products with no data pass.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.curvature.loss_hessian import (
    FisherType,
    make_grad_output_fn,
    mean_rescale,
)
from curvlinops_tpu.ops.diagonal import DiagonalLinearOperator
from curvlinops_tpu.risk import default_batch_size
from curvlinops_tpu.utils.misc import unwrap_model_fn
from curvlinops_tpu.utils.flatten import tree_add


def make_batch_ggn_diagonal(
    model_fn: Callable, loss_fn, mc_samples: int = 0
) -> Callable:
    """Build the pure per-batch GGN-diagonal kernel ``(params, X, y, c, key) -> diag``."""
    fisher_type = FisherType.MC if mc_samples > 0 else FisherType.TYPE2
    grad_output_fn = make_grad_output_fn(loss_fn, fisher_type, max(mc_samples, 1))

    def batch_diag(params: Any, X: Any, y: Any, c, key) -> Any:
        def per_datum(x_n, y_n, k):
            def f_n(p):
                x1 = jax.tree.map(lambda leaf: leaf[None], x_n)
                return model_fn(p, x1)[0]

            pred, vjp_fn = jax.vjp(f_n, params)
            G = grad_output_fn(jax.lax.stop_gradient(pred), y_n, k)  # [V, *out]
            JTg = jax.vmap(lambda g: vjp_fn(g)[0])(G)  # leaves [V, *p]
            return jax.tree.map(lambda t: jnp.sum(t**2, axis=0), JTg)

        batch_size = default_batch_size(X)
        keys = jax.random.split(key, batch_size)
        contribs = jax.vmap(per_datum)(X, y, keys)
        # mean_rescale: masked-loss denominator under CE ignore_index
        # (the Fisher diagonal is linear in the loss scale; 1 when unpadded)
        c_batch = float(batch_size) if loss_fn.reduction == "mean" else 1.0
        c_batch = c_batch / mean_rescale(loss_fn, y)
        return jax.tree.map(lambda t: (c / c_batch) * jnp.sum(t, axis=0), contribs)

    return batch_diag


class GGNDiagonalLinearOperator(DiagonalLinearOperator):
    """The diagonal of the GGN, materialized once and applied elementwise.

    Construction delegates the dataset plumbing — the two-pass data
    determinism probe, ``num_data`` inference, normalization factors,
    per-batch key folding, and mesh batch placement — to an internal
    :class:`~curvlinops_tpu.curvature.ggn.GGNLinearOperator` so the
    conventions can never diverge from the risk layer (the reference's
    computer likewise runs ``super()._check_deterministic()``,
    ``computers/ggn_diagonal.py:194-203``). The vmap-compatibility probe
    (batched forward == vmapped per-example forward) is diagonal-specific
    and stays here.
    """

    def __init__(
        self,
        model_fn: Callable,
        loss_fn,
        params: Any,
        data,
        *,
        mc_samples: int = 0,
        seed: int = 2147483647,
        batch_size_fn: Callable | None = None,
        num_data: int | None = None,
        check_deterministic: bool = True,
        mesh=None,
        data_axis: str = "data",
        progressbar: bool = False,
    ):
        from curvlinops_tpu.curvature.ggn import GGNLinearOperator

        helper = GGNLinearOperator(
            model_fn, loss_fn, params, data,
            mc_samples=mc_samples, seed=seed, batch_size_fn=batch_size_fn,
            num_data=num_data, check_deterministic=check_deterministic,
            mesh=mesh, data_axis=data_axis, progressbar=progressbar,
        )
        if check_deterministic:
            self._check_vmap_compatible(model_fn, params, data)

        frozen, raw = unwrap_model_fn(model_fn)

        def outer(frozen, params, X, y, c, key):
            # `frozen` is a traced jit ARGUMENT here; the inner closure
            # captures the tracer, not the arrays — no HLO constants
            inner = make_batch_ggn_diagonal(
                lambda p, x: raw(frozen, p, x), loss_fn, mc_samples
            )
            return inner(params, X, y, c, key)

        jitted = jax.jit(outer)
        base_key = jax.random.key(seed)
        run_params = helper._replicate(params)
        diag = None
        for idx, (X, y) in enumerate(
            helper._loop_over_data(desc="ggn_diagonal" if progressbar else None)
        ):
            c = helper._get_normalization_factor(X, y)
            out = jitted(
                frozen, run_params, X, y, jnp.asarray(c, jnp.float32),
                jax.random.fold_in(base_key, idx),
            )
            diag = out if diag is None else tree_add(diag, out)
        if diag is None:
            raise ValueError("Empty dataset.")
        super().__init__(diag)

        self._model_fn, self._loss_fn, self._params = model_fn, loss_fn, params
        self._data, self._mc_samples = data, mc_samples

        if check_deterministic:
            self.check_deterministic_matvec()

    @staticmethod
    def _check_vmap_compatible(model_fn, params, data) -> None:
        """``f(X) == vmap(f per-datum)(X)`` probe (``_checks.py:163-194``).

        The frozen pytree threads through as a jit ARGUMENT (closing over
        ``model_fn`` would embed a ``FrozenModelFn``'s arrays as HLO
        constants — the remote compile service rejects >~100MB bodies).

        Raises:
            RuntimeError: If the model treats batched and per-example inputs
                differently (e.g. BatchNorm in train mode).
        """
        X0, _ = next(iter(data))
        frozen, raw = unwrap_model_fn(model_fn)

        @jax.jit
        def both(frozen, p, X):
            batched = raw(frozen, p, X)

            def single(x_n):
                x1 = jax.tree.map(lambda leaf: leaf[None], x_n)
                return raw(frozen, p, x1)[0]

            return batched, jax.vmap(single)(X)

        a, b = both(frozen, params, X0)
        if not np.allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6):
            raise RuntimeError(
                "Model is not vmap-compatible: batched forward differs from "
                "vmapped per-example forward (BatchNorm in training mode?)."
            )
