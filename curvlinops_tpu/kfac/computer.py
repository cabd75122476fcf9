"""KFAC Kronecker-factor computation: one jitted kernel per batch shape.

TPU-native unification of the reference's two backends (hooks:
``computers/kfac_hooks.py``; make_fx: ``computers/kfac_make_fx.py``): the
jaxpr IO collector finds the layers (no module hooks — there are no modules),
and the whole per-batch reduction — tapped forward, grad-output sampling, ONE
vmapped backward over all V vectors (vs. the hooks backend's V separate
backward passes, ``kfac_hooks.py:270-277``), sharing-format conversion and
covariance einsums — is a single jitted function, retraced only per distinct
batch shape (the analogue of the reference's per-batch-size FX cache,
``kfac_make_fx.py:122-151``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.curvature.ef import flatten_prediction, flatten_target
from curvlinops_tpu.curvature.loss_hessian import (
    FisherType,
    KFACType,
    make_grad_output_fn,
    mean_rescale,
)
from curvlinops_tpu.kfac import math as kmath
from curvlinops_tpu.kfac.collector import LayerUse, TracedModel
from curvlinops_tpu.kfac.pallas_kernels import (
    conv_input_covariance as pallas_conv_input_covariance,
    pallas_conv_cov_supported,
)
from curvlinops_tpu.losses import CrossEntropyLoss, SUPPORTED_LOSSES
from curvlinops_tpu.risk import _num_loss_terms_in_batch, default_batch_size
from curvlinops_tpu.utils.misc import unwrap_model_fn
from curvlinops_tpu.utils.flatten import tree_add


@dataclass
class ParamGroup:
    """A canonical-space block: a weight (with uses), a bias, or both.

    ``stack > 0`` marks a scan-stacked group: the leaf holds ``stack``
    independent per-iteration weights, its factors carry a leading ``stack``
    axis, and the canonical block is ``stack`` Kronecker blocks batched into
    one set of arrays (``[L, d_out, d_out]`` / ``[L, d_in, d_in]``).
    """

    name: str
    weight_path: tuple | None
    bias_path: tuple | None
    uses: list  # LayerUse objects providing the IO
    joint: bool  # weight and bias share one block (bias column appended)
    d_in: int  # canonical input dim (incl. bias column when joint)
    d_out: int
    stack: int = 0  # scan length for stacked groups, else 0
    input_diag: bool = False  # embedding groups: aaT is a diagonal [d_in] vector

    @property
    def key(self) -> tuple:
        """Hashable identifier."""
        return (self.weight_path, self.bias_path)


def build_groups(
    layers: list[LayerUse], separate_weight_and_bias: bool
) -> list[ParamGroup]:
    """Merge layer uses into parameter groups (weight tying merges by leaf).

    Mirrors ``io_collector/groups.py:24-84``: uses sharing a weight leaf form
    one group; under joint W+b treatment, conflicting biases are rejected.

    Raises:
        ValueError: On conflicting biases in a tied joint group.
    """
    by_weight: dict[tuple, list[LayerUse]] = {}
    order: list[tuple] = []
    bias_only: dict[tuple, list[LayerUse]] = {}
    bias_order: list[tuple] = []
    for use in layers:
        if use.weight_path is None:
            # bias-only block (weight closed over, reference exclude='weight'):
            # grouped by the bias leaf so tied biases merge
            bkey = tuple(use.bias_path)
            if bkey not in bias_only:
                bias_order.append(bkey)
            bias_only.setdefault(bkey, []).append(use)
            continue
        key = tuple(use.weight_path)
        if key not in by_weight:
            order.append(key)
        by_weight.setdefault(key, []).append(use)

    def _use_dims(u) -> tuple[int, int]:
        if u.kind == "conv":
            return (
                int(np.prod([u.meta["w_shape"][d] for d in
                             u.meta["dimension_numbers"].rhs_spec[1:]])),
                u.meta["w_shape"][u.meta["dimension_numbers"].rhs_spec[0]],
            )
        return u.meta["d_in"], u.meta["d_out"]

    groups: list[ParamGroup] = []
    for key in order:
        uses = by_weight[key]
        first = uses[0]
        stacked_uses = [
            u for u in uses if u.meta.get("scan", {}).get("kind") == "stacked"
        ]
        if stacked_uses and len(uses) > 1:
            raise ValueError(
                f"Weight {key} is scan-stacked but has {len(uses)} uses; "
                "tying a stacked leaf with other layers is not supported."
            )
        stack = first.meta["scan"]["length"] if stacked_uses else 0
        if len({u.kind for u in uses}) > 1:
            raise ValueError(
                f"Weight {key} is tied across layer kinds "
                f"{sorted({u.kind for u in uses})}; its canonical KFAC blocks "
                "are incompatible (e.g. embedding [d, V] vs head [V, d])."
            )
        d_in, d_out = _use_dims(first)
        for u in uses[1:]:
            if _use_dims(u) != (d_in, d_out):
                raise ValueError(
                    f"Weight {key} is tied across layers with different "
                    f"canonical shapes ({_use_dims(u)} vs {(d_in, d_out)}); "
                    "KFAC cannot merge their covariances."
                )
        bias_paths = {tuple(u.bias_path) for u in uses if u.bias_path is not None}
        name = "+".join(u.name for u in uses)
        input_diag = first.kind == "embedding"

        if separate_weight_and_bias:
            groups.append(
                ParamGroup(
                    name, key, None, uses, joint=False,
                    d_in=d_in, d_out=d_out, stack=stack, input_diag=input_diag,
                )
            )
            # DictKey path elements are not orderable -> sort by repr. Each
            # bias block only sees the uses that actually add THAT bias (a
            # tied weight may pair with distinct biases per use).
            for bp in sorted(bias_paths, key=str):
                bias_uses = [
                    u for u in uses
                    if u.bias_path is not None and tuple(u.bias_path) == bp
                ]
                groups.append(
                    ParamGroup(
                        "+".join(u.name for u in bias_uses) + ".bias",
                        None, bp, bias_uses, joint=False,
                        d_in=1, d_out=d_out, stack=stack,
                    )
                )
        else:
            if len(bias_paths) > 1:
                raise ValueError(
                    f"Tied group {name} has conflicting biases under joint "
                    "weight+bias treatment; use separate_weight_and_bias=True."
                )
            bias_path = next(iter(bias_paths)) if bias_paths else None
            joint = bias_path is not None
            groups.append(
                ParamGroup(
                    name, key, bias_path, uses, joint=joint,
                    d_in=d_in + (1 if joint else 0), d_out=d_out, stack=stack,
                    input_diag=input_diag,
                )
            )

    for bkey in bias_order:
        uses = bias_only[bkey]
        d_outs = {u.meta["d_out"] for u in uses}
        if len(d_outs) > 1:
            raise ValueError(
                f"Bias {bkey} is tied across outputs with different feature "
                f"counts {sorted(d_outs)}; KFAC cannot merge their blocks."
            )
        groups.append(
            ParamGroup(
                "+".join(u.name for u in uses) + ".bias",
                None, bkey, uses, joint=False,
                d_in=1, d_out=d_outs.pop(), stack=0,
            )
        )
    return groups


class KFACComputer:
    """Accumulates per-group ``aaT`` / ``ggT`` Kronecker factors over a dataset."""

    def __init__(
        self,
        model_fn: Callable,
        loss_fn,
        params: Any,
        data,
        *,
        fisher_type: str = FisherType.MC,
        mc_samples: int = 1,
        kfac_approx: str = KFACType.EXPAND,
        separate_weight_and_bias: bool = True,
        num_data: int | None = None,
        num_per_example_loss_terms: int | None = None,
        seed: int = 2147483647,
        batch_size_fn: Callable | None = None,
        check_deterministic: bool = True,
        mesh=None,
        data_axis: str = "data",
        use_pallas: str | bool = "auto",
    ):
        if not isinstance(loss_fn, SUPPORTED_LOSSES):
            raise ValueError(
                f"Loss must be one of {[c.__name__ for c in SUPPORTED_LOSSES]}."
            )
        fisher_type = FisherType(fisher_type)
        kfac_approx = KFACType(kfac_approx)
        if fisher_type != FisherType.MC and mc_samples != 1:
            raise ValueError(
                f"mc_samples={mc_samples} requires fisher_type=FisherType.MC."
            )
        self.model_fn, self.loss_fn, self.params = model_fn, loss_fn, params
        self.frozen, self._raw_model_fn = unwrap_model_fn(model_fn)
        self.data = data
        self.fisher_type, self.mc_samples = fisher_type, mc_samples
        self.kfac_approx = kfac_approx
        self.separate_weight_and_bias = separate_weight_and_bias
        self.seed = seed
        self.mesh, self.data_axis = mesh, data_axis
        if use_pallas == "auto":
            # fused Pallas patch-covariance only pays off on real TPU cores
            use_pallas = jax.default_backend() == "tpu" and mesh is None
        self.use_pallas = bool(use_pallas)
        self._pallas_interpret = jax.default_backend() != "tpu"
        self.batch_size_fn = batch_size_fn or default_batch_size
        self._kernel_cache: dict = {}
        self._traced_cache: dict = {}

        # dataset statistics (<= 1 traversal, _empirical_risk.py:121-177)
        need_n = num_data is None
        need_terms = num_per_example_loss_terms is None
        if need_n or need_terms:
            n_acc, t_acc = 0, 0
            for X, y in data:
                n_acc += self.batch_size_fn(X)
                t_acc += _num_loss_terms_in_batch(loss_fn, y)
            if need_n:
                num_data = n_acc
            if need_terms:
                if t_acc % num_data != 0:
                    raise ValueError(
                        "Loss terms not divisible by the number of data points."
                    )
                num_per_example_loss_terms = t_acc // num_data
        self.num_data = num_data
        self.num_per_example_loss_terms = num_per_example_loss_terms

        # layer discovery on the first batch's shapes
        X0, _ = next(iter(data))
        traced = self._get_traced(X0)
        self.groups = build_groups(traced.layers, separate_weight_and_bias)
        if (
            any(g.input_diag for g in self.groups)
            and self.kfac_approx != KFACType.EXPAND
        ):
            raise ValueError(
                "Embedding layers support kfac_approx=KFACType.EXPAND only "
                "(averaging one-hot inputs over the sharing axis destroys "
                "the exact-diagonal covariance structure)."
            )
        self._check_deterministic = check_deterministic

    # ------------------------------------------------------------------ #
    def _get_traced(self, X: Any) -> TracedModel:
        shape_key = tuple(
            (tuple(jnp.shape(leaf)), str(jnp.result_type(leaf)))
            for leaf in jax.tree.leaves(X)
        )
        if shape_key not in self._traced_cache:
            self._traced_cache[shape_key] = TracedModel(
                self.model_fn, self.params, X
            )
        return self._traced_cache[shape_key]

    def _unflatten_rows(self, G_rows: jax.Array, pred_shape: tuple) -> jax.Array:
        """``[V, L, C]`` grad-output rows -> ``[V, *pred_shape]``."""
        V = G_rows.shape[0]
        if isinstance(self.loss_fn, CrossEntropyLoss):
            if len(pred_shape) > 2:
                B, C = pred_shape[0], pred_shape[1]
                extra = pred_shape[2:]
                g = G_rows.reshape(V, B, *extra, C)
                return jnp.moveaxis(g, -1, 2)
            return G_rows.reshape(V, *pred_shape)
        return G_rows.reshape(V, *pred_shape)

    def _make_batch_kernel(self, traced: TracedModel) -> Callable:
        loss_fn = self.loss_fn
        fisher_type, mc_samples = self.fisher_type, self.mc_samples
        kfac_approx = self.kfac_approx
        groups = self.groups
        n_data = self.num_data
        use_pallas, pallas_interpret = self.use_pallas, self._pallas_interpret
        grad_output_fn = make_grad_output_fn(loss_fn, fisher_type, mc_samples)

        def batch_kernel(frozen, params, X, y, key, correction):
            delta0 = [
                jnp.zeros(s.shape, s.dtype)
                for s in traced.delta_specs(params, X)
            ]
            (pred, ios, gates), pull = jax.vjp(
                lambda d: traced.apply_with_io(params, d, X, frozen), delta0
            )

            aaT = {}
            for gi, group in enumerate(groups):
                if group.weight_path is None:
                    continue  # bias-only: no input covariance
                cov, S_total = None, 0
                for u in group.uses:
                    bias_pad = (
                        None
                        if not group.joint
                        else (1.0 if u.bias_path is not None else 0.0)
                    )
                    x_u = ios[u.layer_id]
                    meta_u = traced.layers[u.layer_id].meta
                    if u.kind == "embedding":
                        # one-hot inputs: exact diagonal covariance (counts)
                        cov_u = kmath.embedding_input_counts(
                            x_u,
                            meta_u["vocab"],
                            jnp.result_type(*jax.tree.leaves(params)),
                        )
                        scan_u = meta_u.get("scan")
                        batch_axis = 0 if scan_u is None else 1
                        S_u = x_u.size // x_u.shape[batch_axis]
                        cov = cov_u if cov is None else cov + cov_u
                        S_total += S_u
                        continue
                    if (
                        use_pallas
                        and u.kind == "conv"
                        and "scan" not in meta_u
                        and kfac_approx == KFACType.EXPAND
                        and pallas_conv_cov_supported(x_u.shape, meta_u, bias_pad)
                    ):
                        # fused patch-extraction + covariance; the patch
                        # tensor never hits HBM
                        cov_u, S_u = pallas_conv_input_covariance(
                            x_u, meta_u, bias_pad, interpret=pallas_interpret
                        )
                        cov_u = cov_u.astype(jnp.float32)
                    else:
                        # block-form padded covariance: the bias-pad column
                        # is folded in closed form, so no padded tap/patch
                        # copy is materialized next to the vjp residuals
                        cov_u, S_u = kmath.input_covariance(
                            x_u, u.kind, meta_u, kfac_approx, bias_pad=bias_pad
                        )
                    # cond-gated layer: an untaken branch contributes a zero
                    # Fisher block (the gate is 1 outside conds)
                    gate = gates[u.layer_id]
                    cov_u = cov_u * gate.astype(cov_u.dtype)
                    cov = cov_u if cov is None else cov + cov_u
                    S_total += S_u
                aaT[gi] = cov / (n_data * S_total)

            ggT = {}
            if fisher_type == FisherType.FORWARD_ONLY:
                return aaT, ggT  # identity ggT is attached after the data loop

            rows = flatten_prediction(loss_fn, jax.lax.stop_gradient(pred))
            y_rows = flatten_target(loss_fn, y)
            L = rows.shape[0]
            keys = jax.random.split(key, L)
            G_rows = jax.vmap(grad_output_fn)(rows, y_rows, keys)  # [L, V, C]
            G_rows = jnp.moveaxis(G_rows, 1, 0)  # [V, L, C]
            if loss_fn.reduction == "mean":
                G_rows = G_rows / L
            # ignore_index: the /L division and loss_correction count the
            # STATIC loss terms for EVERY fisher type (EMPIRICAL rows are
            # per-row grads, so the same algebra applies); one linear factor
            # static/count converts to the true masked-loss convention
            # (exactly 1 when nothing is padded)
            corr_eff = correction * mean_rescale(loss_fn, y)
            G_pred = self._unflatten_rows(G_rows, jnp.shape(pred))

            ios_zero = [jnp.zeros_like(i) for i in ios]
            gates_zero = [jnp.zeros_like(g) for g in gates]
            # ONE batched backward over all V vectors
            glayers = jax.vmap(
                lambda gp: pull((gp, ios_zero, gates_zero))[0]
            )(G_pred)

            for gi, group in enumerate(groups):
                parts = [
                    kmath.grad_to_sharing_format(
                        glayers[u.layer_id],
                        u.kind,
                        traced.layers[u.layer_id].meta,
                        kfac_approx,
                    )
                    for u in group.uses
                ]
                g = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
                ggT[gi] = kmath.gradient_covariance(g, corr_eff)
            return aaT, ggT

        return batch_kernel

    def _get_kernel(self, X: Any) -> Callable:
        shape_key = tuple(
            (tuple(jnp.shape(leaf)), str(jnp.result_type(leaf)))
            for leaf in jax.tree.leaves(X)
        )
        if shape_key not in self._kernel_cache:
            traced = self._get_traced(X)
            jitted = jax.jit(self._make_batch_kernel(traced))
            frozen = self.frozen
            self._kernel_cache[shape_key] = lambda *args: jitted(frozen, *args)
        return self._kernel_cache[shape_key]

    # ------------------------------------------------------------------ #
    def compute(self) -> tuple[dict, dict, list[ParamGroup]]:
        """Accumulate factors over the dataset.

        Returns:
            ``(input_covariances, gradient_covariances, groups)`` keyed by
            group index.
        """
        if self._check_deterministic:
            self._determinism_probe()

        base_key = jax.random.key(self.seed)
        params = self.params
        if self.mesh is not None:
            from curvlinops_tpu.parallel.mesh import replicate

            params = replicate(params, self.mesh)
        aaT_acc: dict = {}
        ggT_acc: dict = {}
        for idx, (X, y) in enumerate(self.data):
            if self.mesh is not None:
                from curvlinops_tpu.parallel.mesh import shard_batch

                X = shard_batch(X, self.mesh, self.data_axis)
                y = shard_batch(y, self.mesh, self.data_axis)
            kernel = self._get_kernel(X)
            B = self.batch_size_fn(X)
            correction = kmath.loss_correction(
                B,
                self.num_per_example_loss_terms,
                self.loss_fn.reduction,
                self.num_data,
            )
            aaT, ggT = kernel(
                params,
                X,
                y,
                jax.random.fold_in(base_key, idx),
                jnp.float32(correction),
            )
            for gi, val in aaT.items():
                aaT_acc[gi] = val if gi not in aaT_acc else aaT_acc[gi] + val
            for gi, val in ggT.items():
                ggT_acc[gi] = val if gi not in ggT_acc else ggT_acc[gi] + val

        if self.fisher_type == FisherType.FORWARD_ONLY:
            # identity gradient covariance regardless of data (FOOF)
            for gi, group in enumerate(self.groups):
                eye = jnp.eye(group.d_out, dtype=self._param_dtype())
                ggT_acc[gi] = (
                    jnp.broadcast_to(eye, (group.stack, *eye.shape))
                    if group.stack
                    else eye
                )

        return aaT_acc, ggT_acc, self.groups

    def _param_dtype(self):
        return jnp.result_type(*jax.tree.leaves(self.params))

    def _determinism_probe(self) -> None:
        """Two-pass loss/gradient comparison (``_empirical_risk.py:179-235``).

        Raises:
            RuntimeError: If the two passes disagree.
        """
        raw, frozen, loss_fn = self._raw_model_fn, self.frozen, self.loss_fn

        @jax.jit
        def batch_loss_grad(frozen, params, X, y):
            return jax.value_and_grad(
                lambda p: loss_fn(raw(frozen, p, X), y)
            )(params)

        def one_pass():
            tl, tg = None, None
            for X, y in self.data:
                loss, grad = batch_loss_grad(frozen, self.params, X, y)
                tl = loss if tl is None else tl + loss
                tg = grad if tg is None else tree_add(tg, grad)
            return tl, tg

        l1, g1 = one_pass()
        l2, g2 = one_pass()
        if not np.allclose(np.asarray(l1), np.asarray(l2), rtol=5e-5, atol=1e-6):
            raise RuntimeError("Check for deterministic total loss failed.")
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            if not np.allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6):
                raise RuntimeError("Check for deterministic total gradient failed.")
