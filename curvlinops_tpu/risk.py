"""Empirical-risk machinery shared by all curvature operators.

TPU-native re-design of the reference's ``_EmpiricalRiskMixin``
(``curvlinops/_empirical_risk.py:20-439``) and ``CurvatureLinearOperator``
(``curvlinops/_torch_base.py:817-1007``):

- the per-batch matrix-matrix product is ONE pure jitted function
  ``(params, X, y, M, c, key) -> c * A_batch M`` (retraced only per distinct
  batch shape — the JAX analogue of the reference's shape-keyed ``make_fx``
  cache);
- the dataset loop accumulates jitted per-batch results on device;
- under a ``jax.sharding.Mesh``, batches are sharded over the mesh's data axis
  and parameters replicated, so XLA partitions the batched autodiff and inserts
  the ``psum`` over ICI automatically (the data-parallel scale-out the
  reference lists as a future idea, ``README.md:71``).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.losses import CrossEntropyLoss, Loss
from curvlinops_tpu.ops.base import LinearOperator
from curvlinops_tpu.utils.misc import unwrap_model_fn
from curvlinops_tpu.utils.flatten import spec_of, tree_add

# one fused dispatch per accumulated batch instead of one eager add per leaf
# (matters on runtimes with per-dispatch latency; free elsewhere)
_tree_add = jax.jit(tree_add)


def default_batch_size(X: Any) -> int:
    """Leading dimension of the first array leaf of ``X``."""
    leaves = jax.tree.leaves(X)
    if not leaves:
        raise ValueError("Cannot infer batch size from an empty input pytree.")
    return int(jnp.shape(leaves[0])[0])


def _make_batch_grad_loss(raw: Callable, loss_fn) -> Callable:
    """The per-batch normalized value-and-grad kernel shared by the
    streaming (`gradient_and_loss`) and fused (`_fused_gradient_and_loss`)
    paths — ONE definition so the two can never silently diverge."""

    def batch_grad_loss(frozen, params, X, y, c):
        def objective(p):
            return c * loss_fn(raw(frozen, p, X), y)

        return jax.value_and_grad(objective)(params)

    return batch_grad_loss


def _num_loss_terms_in_batch(loss_func: Loss, y: Any) -> int:
    """Count loss terms in a batch target, mirroring ``_empirical_risk.py:160-166``."""
    y_shape = jnp.shape(y)
    if isinstance(loss_func, CrossEntropyLoss):
        return int(np.prod(y_shape)) if y_shape else 1
    return int(np.prod(y_shape[:-1])) if len(y_shape) > 1 else int(y_shape[0])


class EmpiricalRiskOperator(LinearOperator):
    """Base for operators defined by autodiff over an empirical-risk dataset.

    Args:
        model_fn: Functional forward pass ``(params, X) -> prediction``.
        loss_fn: A :class:`curvlinops_tpu.losses.Loss` (or any callable
            ``(prediction, y) -> scalar`` with a ``reduction`` attribute), or
            ``None`` for loss-independent operators (Jacobians).
        params: Parameter pytree at which the matrix is evaluated.
        data: Iterable of ``(X, y)`` mini-batches. ``X`` may be any pytree
            (dict-like inputs need ``batch_size_fn``).
        batch_size_fn: Batch size from ``X``; defaults to the first leaf's
            leading dim.
        num_data: Dataset size; inferred with one traversal if ``None``.
        num_per_example_loss_terms: Loss terms per example (e.g. tokens per
            sequence); inferred when required and ``None``.
        check_deterministic: Run the two-pass loss/grad and double-matvec
            determinism probes (``_empirical_risk.py:179``,
            ``_torch_base.py:542``). Default ``True``.
        seed: Base seed for operators that sample (MC Fisher). Per-batch keys
            are derived deterministically by batch index.
        mesh: Optional ``jax.sharding.Mesh`` for data-parallel execution.
        data_axis: Mesh axis name to shard the batch dimension over.
        progressbar: Show a tqdm progress bar over batches.
    """

    SELF_ADJOINT: bool = False
    FIXED_DATA_ORDER: bool = False
    NEEDS_NUM_PER_EXAMPLE_LOSS_TERMS: bool = False
    USES_RANDOMNESS: bool = False

    def __init__(
        self,
        model_fn: Callable[[Any, Any], jax.Array],
        loss_fn: Loss | None,
        params: Any,
        data: Iterable[tuple[Any, Any]],
        *,
        batch_size_fn: Callable[[Any], int] | None = None,
        num_data: int | None = None,
        num_per_example_loss_terms: int | None = None,
        check_deterministic: bool = True,
        seed: int = 2147483647,
        mesh=None,
        data_axis: str = "data",
        progressbar: bool = False,
        max_vmap_columns: int | None = None,
        in_spec: Any = None,
        out_spec: Any = None,
    ):
        if not callable(model_fn):
            raise ValueError("model_fn must be a callable (params, X) -> prediction.")
        if loss_fn is not None and getattr(loss_fn, "reduction", None) not in (
            "mean", "sum",
        ):
            raise ValueError(
                "loss_fn must expose a `reduction` attribute equal to 'mean' "
                f"or 'sum' (got {getattr(loss_fn, 'reduction', None)!r}); "
                "use the losses in curvlinops_tpu.losses."
            )
        self._model_fn = model_fn
        self._loss_fn = loss_fn
        self._params = params
        self._data = data
        self._batch_size_fn = batch_size_fn or default_batch_size
        self._seed = seed
        self._mesh = mesh
        self._data_axis = data_axis
        self._progressbar = progressbar
        # bound on columns vmapped simultaneously (memory knob, SURVEY #5)
        self._max_vmap_columns = max_vmap_columns
        self._batch_fn_cache: dict[str, Callable] = {}

        param_spec = spec_of(params)
        super().__init__(
            param_spec if in_spec is None else in_spec,
            param_spec if out_spec is None else out_spec,
        )

        self._N_data, self._num_per_example_loss_terms = self._get_data_statistics(
            num_data, num_per_example_loss_terms
        )

        if check_deterministic:
            self._check_deterministic()
            self.check_deterministic_matvec()

    # ------------------------------------------------------------------ #
    # Data statistics & iteration
    # ------------------------------------------------------------------ #
    @property
    def num_data(self) -> int:
        """Number of data points in the dataset."""
        return self._N_data

    @property
    def num_per_example_loss_terms(self) -> int | None:
        """Loss terms per example, when tracked."""
        return self._num_per_example_loss_terms

    def _get_data_statistics(
        self, num_data: int | None, num_per_example_loss_terms: int | None
    ) -> tuple[int, int | None]:
        """Infer dataset size / per-example loss terms in at most one traversal."""
        need_n = num_data is None
        need_terms = (
            self.NEEDS_NUM_PER_EXAMPLE_LOSS_TERMS
            and self._loss_fn is not None
            and num_per_example_loss_terms is None
        )
        if not need_n and not need_terms:
            return num_data, num_per_example_loss_terms

        n_acc, terms_acc = 0, 0
        # iterate the raw iterable: this pass reads only host-visible shapes,
        # and _loop_over_data would device_put/shard every batch onto the
        # mesh just to discard it
        for X, y in self._data:
            if need_n:
                n_acc += self._batch_size_fn(X)
            if need_terms:
                terms_acc += _num_loss_terms_in_batch(self._loss_fn, y)
        n = n_acc if need_n else num_data
        if need_terms:
            if terms_acc % n != 0:
                raise ValueError(
                    "The number of loss terms must be divisible by the number of "
                    f"data points; num_loss_terms={terms_acc}, N_data={n}."
                )
            num_per_example_loss_terms = terms_acc // n
        return n, num_per_example_loss_terms

    def _loop_over_data(self, desc: str | None = None):
        """Yield mini-batches, placed on the mesh when data-parallel."""
        data_iter = self._data
        if self._progressbar:
            try:
                from tqdm import tqdm

                data_iter = tqdm(
                    data_iter, desc=f"{type(self).__name__}.{desc or 'batches'}"
                )
            except ImportError:
                pass
        for X, y in data_iter:
            yield self._shard_batch(X, y)

    def _shard_batch(self, X: Any, y: Any) -> tuple[Any, Any]:
        """Place a batch according to the mesh (no-op single-device)."""
        if self._mesh is None:
            return X, y
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard(leaf):
            ndim = jnp.ndim(leaf)
            spec = P(self._data_axis, *([None] * (ndim - 1))) if ndim else P()
            return jax.device_put(leaf, NamedSharding(self._mesh, spec))

        return jax.tree.map(shard, X), jax.tree.map(shard, y)

    def _replicate(self, tree: Any) -> Any:
        """Replicate a pytree over the mesh (no-op single-device)."""
        if self._mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self._mesh, P())
        return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), tree)

    def _get_normalization_factor(self, X: Any, y: Any) -> float:
        """Batch-to-dataset normalization (``_empirical_risk.py:340-352``)."""
        if self._loss_fn is None:
            return 1.0
        return {"sum": 1.0, "mean": self._batch_size_fn(X) / self._N_data}[
            self._loss_fn.reduction
        ]

    def linearized(self, remat=None) -> "LinearOperator":
        """Hold the per-batch model linearizations on device.

        Returns an operator computing the SAME matrix whose matvecs skip the
        primal forward (and, for the Hessian, the primal backward) pass —
        the residuals are cached as device arrays at construction. The right
        trade for iterative workloads (solves, spectra, estimation) against
        fixed data, at the memory cost of one batch's activations. See
        :class:`curvlinops_tpu.curvature.held.HeldLinearizationOperator`.

        Args:
            remat: Bound the held-residual memory by rematerializing part of
                the linearization inside each matvec. ``None`` (default)
                holds every residual; ``True`` wraps the model in
                :func:`jax.checkpoint` (recompute everything from the held
                inputs); a :mod:`jax.checkpoint_policies`-style callable
                selects which residuals to hold (see
                :func:`curvlinops_tpu.curvature.held.save_smaller_than` —
                attention-scale ``[B, H, T, T]`` tensors are the usual
                offenders on transformers).
        """
        from curvlinops_tpu.curvature.held import HeldLinearizationOperator

        return HeldLinearizationOperator(self, remat=remat)

    # ------------------------------------------------------------------ #
    # The hot path: accumulated per-batch matmat
    # ------------------------------------------------------------------ #
    def _make_batch_matmat(self) -> Callable:
        """Return the pure per-batch kernel ``(params, X, y, M, c, key) -> c * A_b M``.

        Built from ``self._model_fn``; concrete operators implement
        :meth:`_make_batch_matmat_with` instead so frozen model constants can
        be injected as traced arguments. ``M`` is a pytree of the input space
        with a trailing column axis on every leaf.
        """
        return self._make_batch_matmat_with(self._model_fn)

    def _make_batch_matmat_with(self, model_fn: Callable) -> Callable:
        """Build the per-batch kernel for an explicit ``model_fn``."""
        raise NotImplementedError

    def _batch_matmat_jitted(self) -> Callable:
        """Jitted per-batch kernel (cached; retraces only per batch shape).

        Frozen model constants (see ``utils.misc.FrozenModelFn``) enter the
        jitted program as arguments, not embedded HLO constants.
        """
        if "matmat" not in self._batch_fn_cache:
            frozen, raw = unwrap_model_fn(self._model_fn)

            def outer(frozen, params, X, y, M, c, key):
                kernel = self._make_batch_matmat_with(
                    lambda p, x: raw(frozen, p, x)
                )
                return kernel(params, X, y, M, c, key)

            jitted = jax.jit(outer)
            self._batch_fn_cache["matmat"] = lambda *args: jitted(frozen, *args)
        return self._batch_fn_cache["matmat"]

    # total stacked-batch bytes above which the scan path stops copying the
    # dataset into one leading-axis array and falls back to the unrolled form
    _FUSE_STACK_BYTE_LIMIT = 2 << 30
    # batch count above which an unrolled multi-batch trace gets too large
    _FUSE_UNROLL_LIMIT = 64

    def _matmat(self, M: Any) -> Any:
        fused = self._fused_matmat()
        if fused is not None:
            return fused(self._replicate(M))
        fn = self._batch_matmat_jitted()
        params = self._replicate(self._params)
        M = self._replicate(M)
        base_key = jax.random.key(self._seed)
        AM = None
        for idx, (X, y) in enumerate(self._loop_over_data(desc="matmat")):
            c = jnp.asarray(self._get_normalization_factor(X, y), self.dtype)
            key = jax.random.fold_in(base_key, idx)
            out = fn(params, X, y, M, c, key)
            AM = out if AM is None else _tree_add(AM, out)
        if AM is None:
            raise ValueError("Empty dataset: no batches to accumulate over.")
        return AM

    def _fused_matmat(self) -> Callable | None:
        """One-dispatch multi-batch accumulation, or ``None`` to stream.

        When the dataset has several batches, the per-batch kernels and the
        accumulating adds fuse into ONE jitted program: a ``lax.scan`` over a
        stacked ``[n_batches, ...]`` dataset when batch shapes are uniform
        (O(1) trace size), an unrolled loop for ragged batches. Data, params
        and the per-batch normalization/keys enter as jit ARGUMENTS. Streaming
        (one dispatch per batch) remains for single batches, progress bars,
        ``fuse_batches=False``, and datasets past the unroll/stack limits.
        """
        if self._progressbar or getattr(self, "fuse_batches", "auto") is False:
            return None
        cache = self._batch_fn_cache
        if "fused_state" not in cache:
            self._materialize_fused_state()
        if cache["fused_state"] is None:
            return None

        mode, data, cs, keys = cache["fused_state"]
        if "fused_matmat" not in cache:
            frozen, raw = unwrap_model_fn(self._model_fn)
            out_spec = self._out_spec

            def make_kernel(frozen):
                return self._make_batch_matmat_with(
                    lambda p, x: raw(frozen, p, x)
                )

            if mode == "scan":

                def fused(frozen, params, data, cs, keys, M):
                    kernel = make_kernel(frozen)
                    K = jax.tree.leaves(M)[0].shape[-1]
                    init = jax.tree.map(
                        lambda s: jnp.zeros(s.shape + (K,), s.dtype), out_spec
                    )

                    def body(acc, xs):
                        (X, y), c, key = xs
                        return tree_add(acc, kernel(params, X, y, M, c, key)), None

                    acc, _ = jax.lax.scan(body, init, (data, cs, keys))
                    return acc

            else:

                def fused(frozen, params, data, cs, keys, M):
                    kernel = make_kernel(frozen)
                    AM = None
                    for i, (X, y) in enumerate(data):
                        out = kernel(params, X, y, M, cs[i], keys[i])
                        AM = out if AM is None else tree_add(AM, out)
                    return AM

            jitted = jax.jit(fused)
            cache["fused_matmat"] = (jitted, frozen)
        jitted, frozen = cache["fused_matmat"]
        params = self._replicate(self._params)
        return lambda M: jitted(frozen, params, data, cs, keys, M)

    def _materialize_fused_state(self) -> None:
        """Stack/collect the dataset for the fused path — always EAGERLY.

        ``traced()`` may trigger this inside a jaxpr trace; without the
        compile-time-eval guard the stacked dataset would be built from
        tracers and leak out of the trace via the cache.
        """
        cache = self._batch_fn_cache
        with jax.ensure_compile_time_eval():
            batches = list(self._loop_over_data(desc="fuse_batches"))
            if len(batches) < 2:
                cache["fused_state"] = None
                return
            cs = jnp.asarray(
                [self._get_normalization_factor(X, y) for X, y in batches],
                self.dtype,
            )
            keys = jnp.stack(
                [
                    jax.random.fold_in(jax.random.key(self._seed), i)
                    for i in range(len(batches))
                ]
            )
            structures = {jax.tree.structure(b) for b in batches}
            shapes = {
                tuple(jnp.shape(l) for l in jax.tree.leaves(b))
                for b in batches
            }
            nbytes = sum(
                l.size * jnp.dtype(l.dtype).itemsize
                for b in batches
                for l in jax.tree.leaves(b)
            )
            uniform = len(structures) == 1 and len(shapes) == 1
            if not (uniform and nbytes <= self._FUSE_STACK_BYTE_LIMIT) and (
                len(batches) > self._FUSE_UNROLL_LIMIT
            ):
                # ragged/huge datasets past the unroll limit stream instead
                cache["fused_state"] = None
                return
            if uniform and nbytes <= self._FUSE_STACK_BYTE_LIMIT:
                stacked = jax.tree.map(
                    lambda *leaves: jnp.stack(leaves), *batches
                )
                if self._mesh is not None:
                    # keep the (now second) batch axis sharded over the mesh
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    def reshard(leaf):
                        spec = (
                            P(None, self._data_axis,
                              *([None] * (jnp.ndim(leaf) - 2)))
                            if jnp.ndim(leaf) >= 2
                            else P()
                        )
                        return jax.device_put(
                            leaf, NamedSharding(self._mesh, spec)
                        )

                    stacked = jax.tree.map(reshard, stacked)
                cache["fused_state"] = ("scan", stacked, cs, keys)
            else:
                cache["fused_state"] = ("unroll", tuple(batches), cs, keys)

    # ------------------------------------------------------------------ #
    # Gradient / loss over the dataset
    # ------------------------------------------------------------------ #
    def gradient_and_loss(self) -> tuple[Any, jax.Array]:
        """Accumulate the full-dataset gradient and loss.

        Counterpart of ``_empirical_risk.py:409-439``.

        Returns:
            ``(gradient pytree, scalar loss)``.

        Raises:
            ValueError: If no loss function was specified.
        """
        if self._loss_fn is None:
            raise ValueError("No loss function specified.")

        fused = self._fused_gradient_and_loss()
        if fused is not None:
            return fused()

        if "grad_loss" not in self._batch_fn_cache:
            frozen, raw = unwrap_model_fn(self._model_fn)
            batch_grad_loss = jax.jit(
                _make_batch_grad_loss(raw, self._loss_fn)
            )
            self._batch_fn_cache["grad_loss"] = (
                lambda *args: batch_grad_loss(frozen, *args)
            )

        fn = self._batch_fn_cache["grad_loss"]
        params = self._replicate(self._params)
        total_loss, total_grad = None, None
        for X, y in self._loop_over_data(desc="gradient_and_loss"):
            c = jnp.asarray(self._get_normalization_factor(X, y), self.dtype)
            loss, grad = fn(params, X, y, c)
            total_loss = loss if total_loss is None else total_loss + loss
            total_grad = grad if total_grad is None else _tree_add(total_grad, grad)
        return total_grad, total_loss

    def _fused_gradient_and_loss(self) -> Callable | None:
        """One-dispatch full-dataset gradient+loss (same policy as
        :meth:`_fused_matmat`); ``None`` to stream."""
        if self._progressbar or getattr(self, "fuse_batches", "auto") is False:
            return None
        cache = self._batch_fn_cache
        if "fused_state" not in cache:
            self._materialize_fused_state()
        if cache["fused_state"] is None:
            return None

        mode, data, cs, keys = cache["fused_state"]
        if "fused_grad_loss" not in cache:
            frozen, raw = unwrap_model_fn(self._model_fn)
            batch_grad_loss = _make_batch_grad_loss(raw, self._loss_fn)

            if mode == "scan":

                def fused(frozen, params, data, cs):
                    # carry dtype must be the LOSS's dtype, not the parameter
                    # dtype: a bf16 model computing its scalar loss in f32
                    # would otherwise fail the scan's carry-type check (the
                    # streaming/unroll paths accumulate via Python + and
                    # don't care)
                    X0, y0 = jax.tree.map(lambda a: a[0], data)
                    loss_sd, _ = jax.eval_shape(
                        batch_grad_loss, frozen, params, X0, y0, cs[0]
                    )
                    init = (jnp.zeros((), loss_sd.dtype),
                            jax.tree.map(jnp.zeros_like, params))

                    def body(acc, xs):
                        (X, y), c = xs
                        loss, grad = batch_grad_loss(frozen, params, X, y, c)
                        return (acc[0] + loss, tree_add(acc[1], grad)), None

                    (loss, grad), _ = jax.lax.scan(body, init, (data, cs))
                    return grad, loss

            else:

                def fused(frozen, params, data, cs):
                    loss, grad = None, None
                    for i, (X, y) in enumerate(data):
                        l_i, g_i = batch_grad_loss(frozen, params, X, y, cs[i])
                        loss = l_i if loss is None else loss + l_i
                        grad = g_i if grad is None else tree_add(grad, g_i)
                    return grad, loss

            jitted = jax.jit(fused)
            cache["fused_grad_loss"] = (jitted, frozen)
        jitted, frozen = cache["fused_grad_loss"]
        params = self._replicate(self._params)
        return lambda: jitted(frozen, params, data, cs)

    # ------------------------------------------------------------------ #
    # Determinism safety rails
    # ------------------------------------------------------------------ #
    def _batch_pred_loss_grad(self):
        """Yield ``((X, y), prediction, loss, grad)`` per batch."""
        if "pred_loss_grad" not in self._batch_fn_cache:
            frozen, raw = unwrap_model_fn(self._model_fn)
            loss_fn = self._loss_fn

            if loss_fn is None:

                @jax.jit
                def fn(frozen, params, X, y, c):
                    return raw(frozen, params, X), None, None

            else:

                @jax.jit
                def fn(frozen, params, X, y, c):
                    def objective(p):
                        pred = raw(frozen, p, X)
                        return c * loss_fn(pred, y), pred

                    (loss, pred), grad = jax.value_and_grad(
                        objective, has_aux=True
                    )(params)
                    return pred, loss, grad

            self._batch_fn_cache["pred_loss_grad"] = (
                lambda *args, _fn=fn: _fn(frozen, *args)
            )

        fn = self._batch_fn_cache["pred_loss_grad"]
        params = self._replicate(self._params)
        for X, y in self._loop_over_data(desc="check_deterministic"):
            c = jnp.asarray(self._get_normalization_factor(X, y), self.dtype)
            pred, loss, grad = fn(params, X, y, c)
            yield (X, y), pred, loss, grad

    def _validate_targets(self, pred: Any, y: Any) -> None:
        """Eagerly refuse invalid cross-entropy targets.

        ``jnp.take_along_axis`` silently WRAPS negative class indices and a
        jitted kernel cannot raise; torch errors on them. Only
        ``ignore_index`` (contributes zero loss) and in-range classes are
        valid. Runs during the determinism rails, where batches are already
        on host.

        Raises:
            ValueError: On any out-of-range target.
        """
        loss_fn = self._loss_fn
        if not isinstance(loss_fn, CrossEntropyLoss):
            return
        C = jnp.shape(pred)[1]
        y_np = np.asarray(y)
        valid = ((y_np >= 0) & (y_np < C)) | (y_np == loss_fn.ignore_index)
        if not valid.all():
            bad = np.unique(y_np[~valid])[:10]
            raise ValueError(
                f"Cross-entropy targets outside [0, {C}) that are not "
                f"ignore_index={loss_fn.ignore_index}: {bad.tolist()}. "
                "jnp indexing would silently wrap them; torch raises."
            )

    def _check_deterministic(self, rtol: float = 5e-5, atol: float = 1e-6) -> None:
        """Two independent data passes must agree (``_empirical_risk.py:179-291``).

        Raises:
            RuntimeError: On any detected non-determinism.
        """
        has_loss = self._loss_fn is not None
        tl1 = tl2 = None
        tg1 = tg2 = None
        for (b1, pred1, loss1, grad1), (b2, pred2, loss2, grad2) in zip(
            self._batch_pred_loss_grad(), self._batch_pred_loss_grad()
        ):
            self._validate_targets(pred1, b1[1])
            if self.FIXED_DATA_ORDER:
                self._check_deterministic_batch(
                    b1, b2, pred1, pred2, loss1, loss2, grad1, grad2, rtol, atol
                )
            if has_loss:
                tl1 = loss1 if tl1 is None else tl1 + loss1
                tl2 = loss2 if tl2 is None else tl2 + loss2
                tg1 = grad1 if tg1 is None else _tree_add(tg1, grad1)
                tg2 = grad2 if tg2 is None else _tree_add(tg2, grad2)
        if has_loss:
            if tl1 is None:
                raise RuntimeError("Empty dataset in determinism check.")
            if not np.allclose(np.asarray(tl1), np.asarray(tl2), rtol=rtol, atol=atol):
                raise RuntimeError("Check for deterministic total loss failed.")
            for g1, g2 in zip(jax.tree.leaves(tg1), jax.tree.leaves(tg2)):
                if not np.allclose(
                    np.asarray(g1), np.asarray(g2), rtol=rtol, atol=atol
                ):
                    raise RuntimeError(
                        "Check for deterministic total gradient failed."
                    )

    @staticmethod
    def _check_deterministic_batch(
        b1, b2, pred1, pred2, loss1, loss2, grad1, grad2, rtol, atol
    ) -> None:
        """Per-batch comparison when ``FIXED_DATA_ORDER`` (``_empirical_risk.py:237``).

        Raises:
            RuntimeError: On any per-batch mismatch.
        """

        def close_tree(a, b) -> bool:
            la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
            return len(la) == len(lb) and all(
                np.allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)
                for x, y in zip(la, lb)
            )

        (X1, y1), (X2, y2) = b1, b2
        if not close_tree(X1, X2):
            raise RuntimeError("Check for deterministic X failed.")
        if not close_tree(y1, y2):
            raise RuntimeError("Check for deterministic y failed.")
        if not close_tree(pred1, pred2):
            raise RuntimeError("Check for deterministic batch prediction failed.")
        if loss1 is not None:
            if not close_tree(loss1, loss2):
                raise RuntimeError("Check for deterministic batch loss failed.")
            if not close_tree(grad1, grad2):
                raise RuntimeError("Check for deterministic batch gradient failed.")


class CurvatureLinearOperator(EmpiricalRiskOperator):
    """Square operators in parameter space (Hessian, GGN, Fisher, ...)."""
