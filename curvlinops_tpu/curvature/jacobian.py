"""Jacobian and transposed-Jacobian linear operators.

Counterparts of the reference ``JacobianLinearOperator`` /
``TransposedJacobianLinearOperator`` (``curvlinops/jacobian.py:108-358``).

``J`` maps parameter space to the stacked prediction space ``[N, *out]``:
per batch, a vmapped ``jax.jvp`` produces the block of rows, concatenated over
batches (``jacobian.py:191-207``). ``J^T`` slices its input rows per batch and
accumulates vmapped ``jax.vjp`` pullbacks (``jacobian.py:309-342``). Both
require a fixed data order and are each other's adjoint.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from curvlinops_tpu.risk import EmpiricalRiskOperator
from curvlinops_tpu.utils.flatten import tree_add, vmap_columns
from curvlinops_tpu.utils.misc import unwrap_model_fn


def _prediction_spec(model_fn, params, data, num_data) -> jax.ShapeDtypeStruct:
    """Shape of the stacked predictions, probed without compute."""
    X0, _ = next(iter(data))
    out = jax.eval_shape(model_fn, params, X0)
    return jax.ShapeDtypeStruct((num_data,) + out.shape[1:], out.dtype)


class JacobianLinearOperator(EmpiricalRiskOperator):
    """Matrix-free Jacobian ``J: params -> [N, *out]`` of the model predictions."""

    FIXED_DATA_ORDER = True

    def __init__(self, model_fn, params, data, **kw):
        kw.setdefault("num_data", None)
        # probe output space before the base class builds shape bookkeeping
        num_data = kw.pop("num_data")
        if num_data is None:
            bs_fn = kw.get("batch_size_fn") or (
                lambda X: jax.tree.leaves(X)[0].shape[0]
            )
            num_data = sum(bs_fn(X) for X, _ in data)
        out_spec = _prediction_spec(model_fn, params, data, num_data)
        super().__init__(
            model_fn, None, params, data, num_data=num_data, out_spec=out_spec, **kw
        )

    def _matmat(self, M: Any) -> Any:
        if "matmat" not in self._batch_fn_cache:
            frozen, raw = unwrap_model_fn(self._model_fn)

            maxcols = self._max_vmap_columns

            @jax.jit
            def batch_matmat(frozen, params, X, M):
                def jvp_one(v):
                    return jax.jvp(
                        lambda p: raw(frozen, p, X), (params,), (v,)
                    )[1]

                return vmap_columns(jvp_one, M, maxcols)

            self._batch_fn_cache["matmat"] = (
                lambda *args: batch_matmat(frozen, *args)
            )
        fn = self._batch_fn_cache["matmat"]
        params = self._replicate(self._params)
        blocks = [
            fn(params, X, M) for X, _ in self._loop_over_data(desc="jacobian")
        ]
        return jnp.concatenate(blocks, axis=0)

    def _adjoint(self) -> "TransposedJacobianLinearOperator":
        return TransposedJacobianLinearOperator(
            self._model_fn,
            self._params,
            self._data,
            num_data=self._N_data,
            batch_size_fn=self._batch_size_fn,
            check_deterministic=False,
        )


class TransposedJacobianLinearOperator(EmpiricalRiskOperator):
    """Matrix-free transposed Jacobian ``J^T: [N, *out] -> params``."""

    FIXED_DATA_ORDER = True

    def __init__(self, model_fn, params, data, **kw):
        num_data = kw.pop("num_data", None)
        if num_data is None:
            bs_fn = kw.get("batch_size_fn") or (
                lambda X: jax.tree.leaves(X)[0].shape[0]
            )
            num_data = sum(bs_fn(X) for X, _ in data)
        in_spec = _prediction_spec(model_fn, params, data, num_data)
        from curvlinops_tpu.utils.flatten import spec_of

        super().__init__(
            model_fn,
            None,
            params,
            data,
            num_data=num_data,
            in_spec=in_spec,
            out_spec=spec_of(params),
            **kw,
        )

    def _matmat(self, M: Any) -> Any:
        if "matmat" not in self._batch_fn_cache:
            frozen, raw = unwrap_model_fn(self._model_fn)

            maxcols = self._max_vmap_columns

            @jax.jit
            def batch_matmat(frozen, params, X, W):
                # pull back rows W ([B, *out, K]) through the batch Jacobian
                _, vjp_fn = jax.vjp(lambda p: raw(frozen, p, X), params)

                def vjp_one(w):
                    return vjp_fn(w)[0]

                return vmap_columns(vjp_one, W, maxcols)

            self._batch_fn_cache["matmat"] = (
                lambda *args: batch_matmat(frozen, *args)
            )
        fn = self._batch_fn_cache["matmat"]
        params = self._replicate(self._params)
        out, offset = None, 0
        for X, _ in self._loop_over_data(desc="jacobian_t"):
            B = self._batch_size_fn(X)
            rows = jax.lax.slice_in_dim(M, offset, offset + B, axis=0)
            res = fn(params, X, rows)
            out = res if out is None else tree_add(out, res)
            offset += B
        return out

    def _adjoint(self) -> JacobianLinearOperator:
        return JacobianLinearOperator(
            self._model_fn,
            self._params,
            self._data,
            num_data=self._N_data,
            batch_size_fn=self._batch_size_fn,
            check_deterministic=False,
        )
