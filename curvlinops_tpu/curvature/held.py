"""Held-linearization curvature operators (primal residuals cached on device).

The reference recomputes the model's forward (and for the Hessian, the
backward) pass inside EVERY matrix-vector product (``ggn.py:41-74``,
``hessian.py:100-118``) — unavoidable there, since torch autograd ties the
linearization point to a fresh graph. Under JAX the linearization of the
model at fixed ``(params, X)`` is a *value*: :func:`jax.linearize` yields
residual arrays that fully determine the JVP, and
:func:`jax.closure_convert` hoists them out of the closure. Holding those
residuals on device turns every subsequent matvec into the pure tangent
computation — no primal forward, no primal gradient — which is the right
trade on TPU for iterative workloads (CG/LSMR solves, Lanczos/LOBPCG
spectra, trace/diagonal estimation: dozens to thousands of matvecs against
one fixed dataset). Supported bases: Hessian, GGN, MC-Fisher, empirical
Fisher, Jacobian, and transposed Jacobian.

``op.linearized()`` returns a :class:`HeldLinearizationOperator` computing
the SAME matrix (exact same floating-point kernel structure, same MC
samples) with two jitted stages per batch:

1. ``build``: runs once, returns the state pytree (linearization residuals,
   prediction, sampled/empirical grad-output rows) as device arrays;
2. ``apply``: per matmat, reconstructs the JVP from the held residuals via
   the trace-time-captured jaxpr and transposes it for the VJP.

Memory cost: the residuals are the model's intermediate activations (per
batch) — the usual activation-memory footprint of one forward (one
forward+backward for the Hessian). Opt-in for that reason.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import LinearOperator
from curvlinops_tpu.utils.flatten import tree_scale, vmap_columns
from curvlinops_tpu.utils.misc import unwrap_model_fn


from curvlinops_tpu.utils.flatten import spec_of as _struct_of  # noqa: E402


def save_smaller_than(limit_bytes: int) -> Callable:
    """A :func:`jax.checkpoint` policy holding only small residuals.

    Heuristic: a primitive's outputs are saveable iff none of its operands
    (and, for ``dot_general``, its computed output) exceeds ``limit_bytes``.
    On transformers this drops the ``[B, H, T, T]`` attention products —
    the residuals that blow up held-linearization memory at long sequence
    length — while holding everything activation-sized; the dropped values
    are recomputed from the held inputs inside each matvec.
    """
    import numpy as np
    from jax._src import lax as lax_internal

    def _nbytes(aval) -> int:
        try:
            return int(np.prod(aval.shape)) * aval.dtype.itemsize
        except Exception:
            return 0

    def policy(prim, *args, **params) -> bool:
        sizes = [_nbytes(a) for a in args if hasattr(a, "shape")]
        if prim is lax_internal.dot_general_p and len(args) >= 2:
            (lc, rc), (lb, rb) = params["dimension_numbers"]
            lhs, rhs = args[0], args[1]
            batch = [lhs.shape[d] for d in lb]
            lfree = [
                s for d, s in enumerate(lhs.shape) if d not in (*lc, *lb)
            ]
            rfree = [
                s for d, s in enumerate(rhs.shape) if d not in (*rc, *rb)
            ]
            out_elems = int(np.prod(batch + lfree + rfree))
            sizes.append(out_elems * lhs.dtype.itemsize)
        return max(sizes, default=0) < limit_bytes

    return policy


def _maybe_remat(f: Callable, remat) -> Callable:
    """Wrap ``f`` in :func:`jax.checkpoint` per the ``remat`` spec."""
    if remat is None:
        return f
    if remat is True:
        return jax.checkpoint(f)
    return jax.checkpoint(f, policy=remat)


def _split_linearize(f: Callable, params: Any, p_struct: Any, holder: dict):
    """Linearize ``f`` at ``params``; hoist the residuals out of the closure.

    Returns ``(primal, consts)``; the pure jaxpr-backed JVP (call as
    ``holder['lin'](v, *consts)``) is captured into ``holder`` at trace time.

    The hoisting is the same ``make_jaxpr``-based mechanism as
    :meth:`curvlinops_tpu.ops.base.LinearOperator.traced` — NOT
    ``jax.closure_convert``, which only hoists inexact-dtype residuals and
    leaks e.g. ReLU's boolean masks as outer-trace tracers.

    ``holder['remat']`` (set by :func:`_kernels_for`) bounds which residuals
    are held: under a checkpoint policy, non-saveable intermediates are
    recomputed inside the linear function from the held inputs instead of
    being hoisted as consts.
    """
    primal, jvp_fn = jax.linearize(_maybe_remat(f, holder.get("remat")), params)

    flat_ex, in_tree = jax.tree.flatten(p_struct)
    out_tree_store = []

    def flat_fn(*flat_v):
        out = jvp_fn(jax.tree.unflatten(in_tree, flat_v))
        flat_out, out_tree = jax.tree.flatten(out)
        out_tree_store.append(out_tree)
        return flat_out

    closed = jax.make_jaxpr(flat_fn)(*flat_ex)
    jaxpr, consts = closed.jaxpr, tuple(closed.consts)
    out_tree = out_tree_store[0]
    from jax.core import eval_jaxpr

    def lin(v, *consts, _jaxpr=jaxpr, _in=in_tree, _out=out_tree):
        flat_v, _ = jax.tree.flatten(v)
        return jax.tree.unflatten(_out, eval_jaxpr(_jaxpr, consts, *flat_v))

    holder["lin"] = lin
    return primal, consts


def _ggn_kernels(op, raw: Callable, holder: dict):
    """Exact-GGN build/apply pair (held analogue of ``ggn.py:57-84``)."""
    loss_fn = op._loss_fn
    p_struct = _struct_of(op._params)
    maxcols = op._max_vmap_columns

    def build(frozen, params, X, y, key):
        pred, consts = _split_linearize(
            lambda p: raw(frozen, p, X), params, p_struct, holder
        )
        return {"pred": jax.lax.stop_gradient(pred), "consts": consts, "y": y}

    def make_apply():
        lin = holder["lin"]

        def apply(state, M, c):
            c = c.astype(jax.tree.leaves(M)[0].dtype)
            consts, pred, y = state["consts"], state["pred"], state["y"]
            jvp = lambda v: lin(v, *consts)  # noqa: E731
            vjp = jax.linear_transpose(jvp, p_struct)
            loss_grad = jax.grad(lambda q: loss_fn(q, y))

            def ggnvp(v):
                jv = jvp(v)
                _, hjv = jax.jvp(loss_grad, (pred,), (jv,))
                return vjp(hjv)[0]

            return tree_scale(c, vmap_columns(ggnvp, M, maxcols))

        return apply

    return build, make_apply


def _ggn_mc_kernels(op, raw: Callable, holder: dict):
    """MC-Fisher build/apply pair (held analogue of ``ggn.py:87-130``).

    The sampled grad-output rows are computed ONCE at hold time with the
    same per-batch keys the base operator folds, so the held operator uses
    the exact same samples."""
    from curvlinops_tpu.curvature.loss_hessian import (
        FisherType,
        make_grad_output_fn,
        mean_rescale,
    )

    loss_fn = op._loss_fn
    p_struct = _struct_of(op._params)
    maxcols = op._max_vmap_columns
    grad_output_fn = make_grad_output_fn(loss_fn, FisherType.MC, op._mc_samples)

    def build(frozen, params, X, y, key):
        pred, consts = _split_linearize(
            lambda p: raw(frozen, p, X), params, p_struct, holder
        )
        batch_size = jax.tree.leaves(pred)[0].shape[0]
        keys = jax.random.split(key, batch_size)
        G = jax.vmap(grad_output_fn)(jax.lax.stop_gradient(pred), y, keys)
        # see ggn.py: masked-loss mean denominator under CE ignore_index
        c_batch = (
            float(batch_size) / mean_rescale(loss_fn, y)
            if loss_fn.reduction == "mean"
            else jnp.asarray(1.0, G.dtype)
        )
        return {"consts": consts, "G": G, "c_batch": c_batch}

    def make_apply():
        lin = holder["lin"]

        def apply(state, M, c):
            c = c.astype(jax.tree.leaves(M)[0].dtype)
            consts, G = state["consts"], state["G"]
            c_batch = state["c_batch"]
            jvp = lambda v: lin(v, *consts)  # noqa: E731
            vjp = jax.linear_transpose(jvp, p_struct)

            def fishervp(v):
                jv = jvp(v)
                coeff = jnp.einsum("nk...,n...->nk", G, jv.astype(G.dtype))
                tangent = jnp.einsum("nk...,nk->n...", G, coeff) / c_batch
                return vjp(tangent.astype(jnp.result_type(jv)))[0]

            return tree_scale(c, vmap_columns(fishervp, M, maxcols))

        return apply

    return build, make_apply


def _ef_kernels(op, raw: Callable, holder: dict):
    """Empirical-Fisher build/apply pair (held analogue of ``ef.py:54-102``)."""
    from curvlinops_tpu.curvature.ef import (
        flatten_prediction,
        flatten_target,
        make_row_grad,
    )

    loss_fn = op._loss_fn
    p_struct = _struct_of(op._params)
    maxcols = op._max_vmap_columns
    row_grad = make_row_grad(loss_fn)

    def build(frozen, params, X, y, key):
        from curvlinops_tpu.losses import CrossEntropyLoss

        pred_flat, consts = _split_linearize(
            lambda p: flatten_prediction(loss_fn, raw(frozen, p, X)),
            params,
            p_struct,
            holder,
        )
        y_flat = flatten_target(loss_fn, y)
        G = row_grad(jax.lax.stop_gradient(pred_flat), y_flat)
        L, C = G.shape
        if loss_fn.reduction != "mean":
            R = jnp.asarray(1.0, G.dtype)
        elif isinstance(loss_fn, CrossEntropyLoss):
            # the mean divides by the NON-ignored loss-term count
            R = jnp.maximum(
                jnp.sum(y_flat != loss_fn.ignore_index), 1
            ).astype(G.dtype)
        else:
            R = jnp.asarray(float(L * C), G.dtype)
        return {"consts": consts, "G": G, "R": R}

    def make_apply():
        lin = holder["lin"]

        def apply(state, M, c):
            c = c.astype(jax.tree.leaves(M)[0].dtype)
            consts, G, R = state["consts"], state["G"], state["R"]
            jvp = lambda v: lin(v, *consts)  # noqa: E731
            vjp = jax.linear_transpose(jvp, p_struct)

            def efvp(v):
                jv = jvp(v)
                coeff = jnp.einsum("lc,lc->l", G, jv)
                return vjp((coeff[:, None] * G) / R)[0]

            return tree_scale(c, vmap_columns(efvp, M, maxcols))

        return apply

    return build, make_apply


def _jacobian_kernels(op, raw: Callable, holder: dict):
    """Jacobian build/apply pair (held analogue of ``jacobian.py:191-207``).

    The held matvec is the pure tangent push-forward — no primal forward."""
    p_struct = _struct_of(op._params)

    def build(frozen, params, X, y, key):
        _, consts = _split_linearize(
            lambda p: raw(frozen, p, X), params, p_struct, holder
        )
        return {"consts": consts}

    maxcols = op._max_vmap_columns

    def make_apply():
        lin = holder["lin"]

        def apply(state, M, c):
            consts = state["consts"]
            jvp = lambda v: lin(v, *consts)  # noqa: E731
            return vmap_columns(jvp, M, maxcols)

        return apply

    return build, make_apply


def _jacobian_t_kernels(op, raw: Callable, holder: dict):
    """Transposed-Jacobian build/apply pair (``jacobian.py:309-342``)."""
    p_struct = _struct_of(op._params)

    def build(frozen, params, X, y, key):
        _, consts = _split_linearize(
            lambda p: raw(frozen, p, X), params, p_struct, holder
        )
        return {"consts": consts}

    maxcols = op._max_vmap_columns

    def make_apply():
        lin = holder["lin"]

        def apply(state, W, c):
            consts = state["consts"]
            jvp = lambda v: lin(v, *consts)  # noqa: E731
            vjp = jax.linear_transpose(jvp, p_struct)

            def vjp_one(w):
                return vjp(w)[0]

            return vmap_columns(vjp_one, W, maxcols)

        return apply

    return build, make_apply


def _hessian_kernels(op, raw: Callable, holder: dict):
    """Hessian build/apply pair (held analogue of ``hessian.py:41-66``).

    Holds the linearization of the GRADIENT: one forward+backward at hold
    time, pure second-order tangent per matvec."""
    loss_fn = op._loss_fn
    p_struct = _struct_of(op._params)
    maxcols = op._max_vmap_columns

    def build(frozen, params, X, y, key):
        grad_fn = jax.grad(lambda p: loss_fn(raw(frozen, p, X), y))
        _, consts = _split_linearize(grad_fn, params, p_struct, holder)
        return {"consts": consts}

    def make_apply():
        lin = holder["lin"]

        def apply(state, M, c):
            c = c.astype(jax.tree.leaves(M)[0].dtype)
            consts = state["consts"]
            hvp = lambda v: lin(v, *consts)  # noqa: E731
            return tree_scale(c, vmap_columns(hvp, M, maxcols))

        return apply

    return build, make_apply


def _kernels_for(op, remat=None) -> tuple[Any, Callable, Callable, dict, str]:
    from curvlinops_tpu.curvature.ef import EFLinearOperator
    from curvlinops_tpu.curvature.ggn import GGNLinearOperator
    from curvlinops_tpu.curvature.hessian import HessianLinearOperator
    from curvlinops_tpu.curvature.jacobian import (
        JacobianLinearOperator,
        TransposedJacobianLinearOperator,
    )

    holder: dict = {"remat": remat}
    frozen, raw = unwrap_model_fn(op._model_fn)
    combine = "accumulate"
    if isinstance(op, HessianLinearOperator):
        build, make_apply = _hessian_kernels(op, raw, holder)
    elif isinstance(op, GGNLinearOperator):
        if op._mc_samples > 0:
            build, make_apply = _ggn_mc_kernels(op, raw, holder)
        else:
            build, make_apply = _ggn_kernels(op, raw, holder)
    elif isinstance(op, EFLinearOperator):
        build, make_apply = _ef_kernels(op, raw, holder)
    elif isinstance(op, JacobianLinearOperator):
        build, make_apply = _jacobian_kernels(op, raw, holder)
        combine = "concat_rows"
    elif isinstance(op, TransposedJacobianLinearOperator):
        build, make_apply = _jacobian_t_kernels(op, raw, holder)
        combine = "slice_rows"
    else:
        raise NotImplementedError(
            f"linearized() supports Hessian/GGN/MC-Fisher/EF/Jacobian "
            f"operators, not {type(op).__name__} (KFAC-family operators "
            "already precompute their factors; their matvecs never touch "
            "the model)."
        )
    return frozen, build, make_apply, holder, combine


class HeldLinearizationOperator(LinearOperator):
    """The same curvature matrix as ``base``, with per-batch model
    linearizations held on device (see module docstring).

    Built via ``base.linearized()``; do not construct directly.
    """

    def __init__(self, base, remat=None) -> None:
        super().__init__(base.in_spec, base.out_spec)
        self.SELF_ADJOINT = base.SELF_ADJOINT
        self._base = base
        self._remat = remat
        frozen, build, make_apply, holder, combine = _kernels_for(base, remat)
        self._combine = combine
        build_jit = jax.jit(build)
        base_key = jax.random.key(base._seed)
        params = base._replicate(base._params)
        self._held: list[tuple[Callable, Any, float]] = []
        self._batch_sizes: list[int] = []
        apply_by_shape: dict = {}
        for idx, (X, y) in enumerate(base._loop_over_data(desc="hold")):
            c = base._get_normalization_factor(X, y)
            self._batch_sizes.append(base._batch_size_fn(X))
            key = jax.random.fold_in(base_key, idx)
            state = build_jit(frozen, params, X, y, key)
            # one apply program per batch shape: the captured jaxpr is
            # refreshed by build_jit's retrace for a new shape
            shape_key = tuple(
                (tuple(jnp.shape(leaf)), str(jnp.result_type(leaf)))
                for leaf in jax.tree.leaves(X)
            )
            if shape_key not in apply_by_shape:
                apply_by_shape[shape_key] = jax.jit(make_apply())
            # pre-transfer the normalization scalar once: a per-matmat
            # jnp.asarray on a Python float would be a fresh host->device
            # transfer on every product
            self._held.append(
                (apply_by_shape[shape_key], state, jnp.asarray(c, self.dtype))
            )
        if not self._held:
            raise ValueError("Empty dataset: nothing to hold.")

    def _matmat(self, M: Any) -> Any:
        from curvlinops_tpu.risk import _tree_add

        M = self._base._replicate(M)
        if self._combine == "concat_rows":  # Jacobian: stack prediction rows
            blocks = [
                apply_jit(state, M, c) for apply_jit, state, c in self._held
            ]
            return jnp.concatenate(blocks, axis=0)
        if self._combine == "slice_rows":  # J^T: pull back per-batch rows
            out, offset = None, 0
            for (apply_jit, state, c), B in zip(self._held, self._batch_sizes):
                rows = jax.lax.slice_in_dim(M, offset, offset + B, axis=0)
                res = apply_jit(state, rows, c)
                out = res if out is None else _tree_add(out, res)
                offset += B
            return out
        AM = None
        for apply_jit, state, c_dev in self._held:
            out = apply_jit(state, M, c_dev)
            AM = out if AM is None else _tree_add(AM, out)
        return AM

    def _adjoint(self) -> "LinearOperator":
        """Adjoint = the held linearization of the base's adjoint (used by
        the non-self-adjoint Jacobian pair; curvature operators are
        ``SELF_ADJOINT`` and never reach this)."""
        return self._base.adjoint().linearized(remat=self._remat)
