"""Jaxpr-based layer-IO collector for KFAC.

TPU-native replacement for the reference's ``torch.fx``/aten pattern-matching
IO collector (``curvlinops/computers/io_collector/collector.py:71-377``,
``linear.py``, ``conv.py``, ``verification.py``, ``groups.py``). Instead of
matching the aten ``addmm``/``mm``/``view`` zoo, we trace ``model_fn`` with
``jax.make_jaxpr`` — where every batched matmul is a single ``dot_general``
and every convolution a single ``conv_general_dilated`` — and

1. track which intermediate values derive from parameter leaves through
   shape-transparent ops (reshape/transpose/convert/broadcast),
2. match ``dot_general`` / ``conv_general_dilated`` equations whose one
   operand is a weight leaf (plus a following ``add`` with a bias leaf),
3. verify completeness: every other use of a parameter-derived value is an
   error listing the offending primitives — refusing instead of silently
   miscomputing, like the reference's path verification
   (``verification.py:74-127``),
4. re-interpret the jaxpr with *taps*: the rebuilt function returns every
   layer's input and adds a zero "delta" to every layer's pre-bias output, so
   one ``jax.vjp`` w.r.t. the deltas yields all layer-output gradients in a
   single batched backward (the analogue of the reference's
   ``is_grads_batched=True`` trick, ``layer_io.py:184-191``).

Weight tying appears naturally as one parameter leaf consumed by several
matched equations; each use becomes its own tap and the factor computation
concatenates the IO along the weight-sharing axis (``groups.py:87-170``).

``lax.scan`` over layers — the idiomatic TPU transformer stack, with no
reference counterpart (torch has no scan) — is supported natively: the scan
body is analyzed recursively, and matched layers come in two flavors:

- **stacked** (the weight enters the scan as a scanned-over ``xs`` input with
  leading axis = scan length ``L``): every iteration applies a *different*
  weight slice, so the leaf contributes ``L`` independent KFAC blocks. The
  rebuilt scan threads per-iteration deltas in as extra ``xs`` and stacks the
  layer inputs as extra ``ys``, so factors carry a leading ``L`` axis and all
  downstream linear algebra (covariance einsums, eigh, Cholesky, Kronecker
  matvecs) batches over it — one XLA dispatch for the whole layer stack.
- **shared** (the weight enters as a scan ``const``): the same weight is
  applied every iteration — weight sharing across scan steps, merged into the
  KFAC weight-sharing axis exactly like sequence positions.

Parameters entering the loop carry, reshaped stacked weights, and nested
scans are refused (never silently miscomputed). ``lax.cond`` around layers is
LOWERED TO SELECT: every branch executes, outputs combine by branch index,
and the untaken branch's layer-input taps are masked to zero — so its aaT
contribution is exactly zero (and its layer-output gradients vanish through
the select), which is the Fisher's own semantics for a layer that did not
run. Ambiguous cond cases stay refused: weights tied across branches (or
between a branch and the outside), embeddings inside branches (masking
indices would mis-count token 0), parameter-derived predicates, cond nested
in scan (and vice versa), and parameters flowing out of the cond. ``while``
wrapping parameter uses is refused. Nested ``pjit``, ``custom_jvp/vjp`` and
``remat`` calls are inlined transparently.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.extend.core as jex_core
import jax.numpy as jnp
from jax import tree_util

from curvlinops_tpu.utils.misc import unwrap_model_fn

# primitives that preserve "this value is (a view of) parameter leaf i"
_TRANSPARENT = {
    "reshape",
    "transpose",
    "convert_element_type",
    "broadcast_in_dim",
    "squeeze",
    "copy",
    "rev",
}

# container primitives whose sub-jaxpr we inline
_CONTAINER_PARAM_KEYS = {
    "pjit": "jaxpr",
    "custom_jvp_call": "call_jaxpr",
    "custom_vjp_call": "call_jaxpr",
    "custom_vjp_call_jaxpr": "fun_jaxpr",
    "remat2": "jaxpr",
    "checkpoint": "jaxpr",
    "closed_call": "call_jaxpr",
    "core_call": "call_jaxpr",
}


@dataclass
class _Op:
    """One flattened equation: primitive, params, input atoms, output keys."""

    prim: Any
    params: dict
    in_atoms: list  # ('lit', value) or ('var', key)
    out_keys: list


@dataclass(frozen=True)
class _Derived:
    """Provenance of a value: which param leaf it views, through which ops.

    ``scan`` is ``None`` at the top level, ``("stacked", L)`` for a per-
    iteration slice of a scanned-over leaf, ``("shared", L)`` for a scan
    const. For stacked entries ``views`` holds only the in-body view chain;
    ``outer_views`` the (convert-only) chain applied to the full leaf before
    the scan.
    """

    leaf: int
    views: tuple = ()
    scan: tuple | None = None
    outer_views: tuple = ()


@dataclass
class LayerUse:
    """One matched use of a weight leaf in a dense/conv equation."""

    layer_id: int
    name: str
    kind: str  # 'dense' | 'conv'
    weight_path: tuple
    op_index: int
    input_slot: int  # which operand of the op is the layer input
    meta: dict = field(default_factory=dict)
    bias_path: tuple | None = None
    scan_op: int | None = None  # top-level op index of the enclosing scan
    cond_op: int | None = None  # top-level op index of the enclosing cond
    cond_branch: int | None = None  # branch index within the cond


@dataclass
class _CondBranch:
    """One branch of a lowered ``cond``: its IR and matched layers."""

    ir: "_FlatIR"
    layer_ids: list = field(default_factory=list)
    tap_by_op: dict = field(default_factory=dict)


@dataclass
class _CondInfo:
    """A top-level ``cond`` op whose branches contain matched layers.

    Lowered to select: EVERY branch executes, branch outputs combine with
    ``lax.select_n`` on the index, and each branch's layer-input taps are
    masked to zero when that branch is not taken — so the untaken branch
    contributes exactly zero to aaT (and its deltas are selected away, so
    ggT contributions vanish through autodiff). This matches the Fisher:
    a layer that did not run contributes a zero block for that datum.
    """

    op_index: int
    branches: list[_CondBranch] = field(default_factory=list)


@dataclass
class _ScanInfo:
    """A top-level scan op whose body contains matched layers."""

    op_index: int
    ir: "_FlatIR"
    num_consts: int
    num_carry: int
    length: int
    reverse: bool
    unroll: int
    layer_ids: list = field(default_factory=list)
    tap_by_op: dict = field(default_factory=dict)


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def _view_descriptor(prim_name: str, params: dict, in_shape: tuple):
    """Serializable description of a transparent op for later replay."""
    if prim_name == "transpose":
        return ("transpose", tuple(params["permutation"]), tuple(in_shape))
    if prim_name == "reshape":
        return ("reshape", tuple(params["new_sizes"]), tuple(in_shape))
    if prim_name == "convert_element_type":
        return ("convert", str(params["new_dtype"]), tuple(in_shape))
    if prim_name == "squeeze":
        return ("squeeze", tuple(params["dimensions"]), tuple(in_shape))
    if prim_name == "broadcast_in_dim":
        return (
            "broadcast",
            (tuple(params["shape"]), tuple(params["broadcast_dimensions"])),
            tuple(in_shape),
        )
    if prim_name in ("copy", "rev"):
        return (prim_name, tuple(params.get("dimensions", ())), tuple(in_shape))
    return (prim_name, None, tuple(in_shape))


def _keeps_trailing_axis(prim_name: str, params: dict, in_shape, out_shape) -> bool:
    """Whether a shape-transparent op keeps the trailing (feature) axis intact.

    Layer identity (``produced_by_layer``) may only flow through ops that
    leave the feature axis where a later bias add expects it; a reshape that
    alters the last dimension breaks the pairing, so the bias must then be
    flagged instead of silently attached to the wrong layer (the reference
    refuses these patterns too, ``test/computers/io_collector/
    test_param_io.py:190-210``).
    """
    if prim_name in ("convert_element_type", "copy"):
        return True
    if not in_shape or not out_shape:
        return False
    if prim_name == "transpose":
        return tuple(params["permutation"])[-1] == len(in_shape) - 1
    if prim_name == "rev":
        return (len(in_shape) - 1) not in tuple(params["dimensions"])
    if prim_name == "broadcast_in_dim":
        bd = tuple(params["broadcast_dimensions"])
        return (
            bool(bd)
            and bd[-1] == len(out_shape) - 1
            and out_shape[-1] == in_shape[-1]
        )
    return in_shape[-1] == out_shape[-1]


def _views_invertible(views) -> bool:
    """Whether a weight's view chain can be inverted by the canonicalizers."""
    return all(v[0] in ("transpose", "reshape", "convert", "squeeze") for v in views)


def _bias_element_axes(views, leaf_shape) -> list | None:
    """Axes of the final value that carry DISTINCT leaf elements, in leaf
    order — or ``None`` when the chain cannot be proven order-preserving.

    A layer bias must place its elements on the layer's output-feature axis
    with identity ordering; a chain containing ``rev``/``transpose`` (or a
    reshape that merges/splits the non-trivial dims) may silently permute
    the bias relative to the gradient rows, so the caller refuses on
    ``None``.
    """
    axes = [i for i, s in enumerate(leaf_shape) if s > 1]
    shape = list(leaf_shape)
    for kind, arg, _in_shape in views:
        if kind in ("convert", "copy"):
            continue
        if kind == "squeeze":
            dims = set(arg)
            mapping, j = {}, 0
            for i in range(len(shape)):
                if i not in dims:
                    mapping[i] = j
                    j += 1
            if any(a in dims for a in axes):
                return None
            axes = [mapping[a] for a in axes]
            shape = [s for i, s in enumerate(shape) if i not in dims]
        elif kind == "reshape":
            new_shape = list(arg)
            old_nt = [(i, s) for i, s in enumerate(shape) if s > 1]
            new_nt = [(i, s) for i, s in enumerate(new_shape) if s > 1]
            # provable only when the non-trivial dims survive one-to-one in
            # order (pure squeeze/unsqueeze-style reshapes)
            if [s for _, s in old_nt] != [s for _, s in new_nt]:
                return None
            old_pos = {i: k for k, (i, _) in enumerate(old_nt)}
            axes = [new_nt[old_pos[a]][0] for a in axes]
            shape = new_shape
        elif kind == "broadcast":
            out_shape, bdims = arg
            axes = [bdims[a] for a in axes]
            shape = list(out_shape)
        else:  # transpose, rev, anything else: ordering not provable
            return None
    return axes


class _FlatIR:
    """Flattened (container-inlined) equation list with stable var keys."""

    def __init__(self, closed_jaxpr):
        self.ops: list[_Op] = []
        self.invar_keys: list = []
        self.out_atoms: list = []
        self._frame_counter = itertools.count()
        self._const_env: dict = {}

        jaxpr = closed_jaxpr.jaxpr
        frame = next(self._frame_counter)
        self.invar_keys = [(frame, v) for v in jaxpr.invars]
        for cv, cval in zip(jaxpr.constvars, closed_jaxpr.consts):
            self._const_env[(frame, cv)] = cval
        self._walk(jaxpr, frame)
        self.out_atoms = [self._atom(frame, v) for v in jaxpr.outvars]

    def _atom(self, frame, v):
        if isinstance(v, jex_core.Literal):
            return ("lit", v.val)
        return ("var", (frame, v))

    def _walk(self, jaxpr, frame) -> None:
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name in _CONTAINER_PARAM_KEYS and _CONTAINER_PARAM_KEYS[name] in (
                eqn.params
            ):
                sub_closed = eqn.params[_CONTAINER_PARAM_KEYS[name]]
                sub_jaxpr = getattr(sub_closed, "jaxpr", sub_closed)
                sub_consts = getattr(sub_closed, "consts", [])
                sub_frame = next(self._frame_counter)
                # connect: sub invars alias outer atoms via no-op copy ops
                outer_atoms = [self._atom(frame, v) for v in eqn.invars]
                for cv, cval in zip(sub_jaxpr.constvars, sub_consts):
                    self._const_env[(sub_frame, cv)] = cval
                for sv, atom in zip(sub_jaxpr.invars, outer_atoms):
                    self.ops.append(
                        _Op(None, {"alias": True}, [atom], [(sub_frame, sv)])
                    )
                self._walk(sub_jaxpr, sub_frame)
                for ov, sv in zip(eqn.outvars, sub_jaxpr.outvars):
                    self.ops.append(
                        _Op(
                            None,
                            {"alias": True},
                            [self._atom(sub_frame, sv)],
                            [(frame, ov)],
                        )
                    )
            else:
                self.ops.append(
                    _Op(
                        eqn.primitive,
                        dict(eqn.params),
                        [self._atom(frame, v) for v in eqn.invars],
                        [(frame, v) for v in eqn.outvars],
                    )
                )

    @property
    def const_env(self) -> dict:
        return dict(self._const_env)


def _canonicalize_dense(op: _Op, weight_slot: int, w_shape, x_shape) -> dict | None:
    """Extract canonical [d_in, d_out] info from a dot_general weight use.

    Supports weights used as the rhs (or lhs) operand with no dot batch dims
    and an un-contracted leading input axis (the batch axis). Returns ``None``
    for unsupported contraction patterns.
    """
    (lhs_c, rhs_c), (lhs_b, rhs_b) = op.params["dimension_numbers"]
    if lhs_b or rhs_b:
        return None
    if weight_slot != 1:
        # weight-as-lhs puts its free dims first in the output; unsupported
        return None
    w_contract, x_contract = list(rhs_c), list(lhs_c)
    if 0 in x_contract:
        return None  # batch axis consumed by the contraction
    w_free = [d for d in range(len(w_shape)) if d not in w_contract]
    d_in = 1
    for d in w_contract:
        d_in *= w_shape[d]
    d_out = 1
    for d in w_free:
        d_out *= w_shape[d]
    return {
        "w_contract": tuple(w_contract),
        "w_free": tuple(w_free),
        "x_contract": tuple(x_contract),
        "d_in": d_in,
        "d_out": d_out,
    }


def _is_embedding_gather(op: _Op, w_shape) -> bool:
    """Whether a gather is a whole-row embedding lookup ``W[idx]``.

    The pattern jax emits for advanced indexing / ``jnp.take(..., axis=0)``:
    row index collapsed, full trailing slices. No reference counterpart —
    the reference refuses embedding layers outright (``kfac.py:117``); here
    the one-hot structure makes the input covariance EXACTLY diagonal
    (token counts), so KFAC extends to embeddings at no approximation cost.
    """
    dn = op.params["dimension_numbers"]
    return (
        tuple(dn.collapsed_slice_dims) == (0,)
        and tuple(dn.start_index_map) == (0,)
        and not dn.operand_batching_dims
        and not dn.start_indices_batching_dims
        and tuple(op.params["slice_sizes"]) == (1,) + tuple(w_shape[1:])
    )


def _conv_meta(op: _Op, w_shape) -> dict:
    """Extract convolution hyperparameters for patch extraction."""
    dn = op.params["dimension_numbers"]
    return {
        "window_strides": tuple(op.params["window_strides"]),
        "padding": tuple(map(tuple, op.params["padding"])),
        "lhs_dilation": tuple(op.params["lhs_dilation"]),
        "rhs_dilation": tuple(op.params["rhs_dilation"]),
        "dimension_numbers": dn,
        "feature_group_count": op.params["feature_group_count"],
        "batch_group_count": op.params.get("batch_group_count", 1),
        "w_shape": tuple(w_shape),
    }


class TracedModel:
    """Analysis result + tappable re-interpreter of ``model_fn``.

    Args:
        model_fn: Functional forward pass ``(params, X) -> prediction``.
        params: Parameter pytree (ALL leaves must be consumed by supported
            dense/conv layers — pass only the parameters KFAC should cover and
            close over the rest).
        X_example: Example input used for tracing (shapes are baked per batch
            shape; the computer retraces per distinct batch shape like the
            reference's per-batch-size FX cache, ``kfac_make_fx.py:122-151``).
    """

    def __init__(self, model_fn: Callable, params: Any, X_example: Any):
        # frozen (non-differentiated) model constants are traced as leading
        # inputs, NOT captured constants — keeps them out of the kernel HLOs
        frozen, raw = unwrap_model_fn(model_fn)
        self._frozen = frozen
        # ONE abstract trace: return_shape also yields the output pytree
        # (a second eval_shape doubled the seconds-scale trace cost of
        # large models on every per-batch-shape cache miss)
        closed, out_shape = jax.make_jaxpr(raw, return_shape=True)(
            frozen, params, X_example
        )
        n_frozen = len(tree_util.tree_leaves(frozen))

        param_leaves_with_paths, _ = tree_util.tree_flatten_with_path(params)
        self.param_paths = [p for p, _ in param_leaves_with_paths]
        self._param_shapes = [jnp.shape(leaf) for _, leaf in param_leaves_with_paths]
        n_params = len(self.param_paths)
        self._n_frozen = n_frozen

        ir = _FlatIR(closed)
        self._ir = ir
        self._out_tree = tree_util.tree_structure(out_shape)

        # provenance: var key -> _Derived. The view chain records the
        # transparent ops between the leaf and the value (e.g. HuggingFace's
        # Conv1D transposes its kernel before the matmul), so the canonical
        # converters can replay/invert them.
        derived: dict[Any, _Derived] = {}
        for i, key in enumerate(ir.invar_keys[n_frozen : n_frozen + n_params]):
            derived[key] = _Derived(i)

        self.layers: list[LayerUse] = []
        self._scan_infos: dict[int, _ScanInfo] = {}
        self._cond_infos: dict[int, _CondInfo] = {}
        self._unmatched: dict[int, list[str]] = {}
        self._kind_counter: dict[str, int] = {"dense": 0, "conv": 0, "embedding": 0}

        self._match_ir(ir, derived, in_scan=None)

        # weight tying across cond branches (or between a branch and outside)
        # would need cross-context factor normalization — refuse
        by_path: dict[tuple, set] = {}
        for u in self.layers:
            if u.weight_path is None:  # bias-only: refused inside conds
                continue
            by_path.setdefault(tuple(u.weight_path), set()).add(
                (u.cond_op, u.cond_branch)
            )
        for path, ctxs in by_path.items():
            if len(ctxs) > 1 and any(c[0] is not None for c in ctxs):
                leaf = next(
                    i for i, p in enumerate(self.param_paths)
                    if tuple(p) == path
                )
                self._flag(
                    [leaf],
                    "cond (weight tied across cond branches or between a "
                    "branch and the outside)",
                )

        # a bias leaf attached to layers with DIFFERENT weights (or to more
        # than one bias-only block) would create duplicate canonical blocks
        # for the same leaf, whose from_canonical writes silently overwrite
        # each other — refuse (tied-weight layers sharing their bias are
        # fine: one group)
        bias_owners: dict = {}
        for u in self.layers:
            if u.bias_path is None:
                continue
            # bias-only uses of one leaf merge into a single canonical block
            # downstream (build_groups), so they share one owner token; only
            # DISTINCT weight owners (or an attached/bias-only mix) would
            # duplicate the block
            owner = (
                tuple(u.weight_path)
                if u.weight_path is not None
                else "<bias-only>"
            )
            bias_owners.setdefault(tuple(u.bias_path), set()).add(owner)
        for bpath, owners in bias_owners.items():
            if len(owners) > 1:
                leaf = next(
                    i for i, p in enumerate(self.param_paths)
                    if tuple(p) == bpath
                )
                self._flag(
                    [leaf],
                    "add (bias tied across different layers; its canonical "
                    "KFAC block would be duplicated)",
                )

        # completeness verification (collector.py:180-277 analogue)
        used_leaves = {
            tuple(u.weight_path)
            for u in self.layers
            if u.weight_path is not None
        } | {tuple(u.bias_path) for u in self.layers if u.bias_path is not None}
        problems = []
        for i, path in enumerate(self.param_paths):
            msgs = self._unmatched.get(i, [])
            if msgs:
                problems.append(
                    f"  {_path_str(path)}: used by unsupported primitive(s) "
                    f"{sorted(set(msgs))}"
                )
            elif tuple(path) not in used_leaves:
                problems.append(
                    f"  {_path_str(path)}: not consumed by any supported "
                    "dense/conv layer"
                )
        if problems:
            raise ValueError(
                "KFAC supports parameters that only appear as weights/biases of "
                "dense (dot_general) or convolution layers. Offending "
                "parameters:\n" + "\n".join(problems) + "\nPass only supported "
                "parameters to KFAC and close over the rest in model_fn."
            )

        self._top_tap_by_op = {
            u.op_index: u
            for u in self.layers
            if u.scan_op is None and u.cond_op is None
        }

    # ------------------------------------------------------------------ #
    # matching
    # ------------------------------------------------------------------ #
    def _flag(self, leaf_ids, msg: str) -> None:
        for lid in set(x for x in leaf_ids if x is not None):
            self._unmatched.setdefault(lid, []).append(msg)

    def _match_ir(
        self,
        ir: _FlatIR,
        derived: dict,
        in_scan: _ScanInfo | None,
        in_cond: tuple | None = None,
    ) -> dict:
        """Run the matching pass over one IR; returns the final derived map."""
        produced_by_layer: dict[Any, int] = {}  # var key -> layer_id
        # values downstream of ANY matched layer output (through arbitrary
        # ops); a bias added to such a value must not become a bias-only
        # block — it may be a disguised (reshaped/activated) pairing with an
        # in-params layer, which we refuse rather than approximate
        descended: set = set()

        for op_index, op in enumerate(ir.ops):
            in_keys = [a[1] if a[0] == "var" else None for a in op.in_atoms]
            entries = [derived.get(k) for k in in_keys]
            leaf_ids = [e.leaf if e is not None else None for e in entries]
            prim_name = op.prim.name if op.prim is not None else "alias"
            if any(
                k is not None
                and (
                    (
                        k in produced_by_layer
                        and self.layers[produced_by_layer[k]].weight_path
                        is not None
                    )
                    or k in descended
                )
                for k in in_keys
            ):
                descended.update(op.out_keys)

            if op.prim is None:  # alias
                if entries[0] is not None:
                    derived[op.out_keys[0]] = entries[0]
                if in_keys[0] in produced_by_layer:
                    produced_by_layer[op.out_keys[0]] = produced_by_layer[in_keys[0]]
                continue

            if prim_name in _TRANSPARENT:
                if entries[0] is not None:
                    e = entries[0]
                    in_shape = self._atom_shape(op.in_atoms[0])
                    view = _view_descriptor(prim_name, op.params, in_shape)
                    derived[op.out_keys[0]] = _Derived(
                        e.leaf, e.views + (view,), e.scan, e.outer_views
                    )
                if in_keys[0] in produced_by_layer and _keeps_trailing_axis(
                    prim_name,
                    op.params,
                    self._atom_shape(op.in_atoms[0]),
                    tuple(op.out_keys[0][1].aval.shape),
                ):
                    produced_by_layer[op.out_keys[0]] = produced_by_layer[in_keys[0]]
                continue

            if prim_name == "scan" and any(e is not None for e in entries):
                if in_scan is not None:
                    self._flag(
                        leaf_ids, "scan (nested scans around parameters)"
                    )
                    continue
                if in_cond is not None:
                    self._flag(
                        leaf_ids, "scan (scan inside a cond branch around "
                        "parameters)"
                    )
                    continue
                self._analyze_scan(op_index, op, entries, leaf_ids)
                # scan outputs descend from any in-body matched layers: a
                # later bias-only add on them must refuse like the unrolled
                # equivalent would
                descended.update(op.out_keys)
                continue

            if prim_name == "cond" and any(e is not None for e in entries):
                if in_scan is not None or in_cond is not None:
                    self._flag(
                        leaf_ids,
                        "cond (nested inside scan/cond around parameters)",
                    )
                    continue
                if entries[0] is not None:
                    self._flag(
                        [entries[0].leaf], "cond (parameter-derived predicate)"
                    )
                    continue
                if any(e is not None and e.scan is not None for e in entries):
                    self._flag(leaf_ids, "cond (scan-derived operand)")
                    continue
                self._analyze_cond(op_index, op, entries, leaf_ids)
                descended.update(op.out_keys)  # same as scan above
                continue

            if prim_name == "dot_general":
                param_slots = [s for s, lid in enumerate(leaf_ids) if lid is not None]
                if len(param_slots) == 1:
                    w_slot = param_slots[0]
                    e = entries[w_slot]
                    w_shape = self._atom_shape(op.in_atoms[w_slot])
                    x_slot = 1 - w_slot
                    x_aval_shape = self._atom_shape(op.in_atoms[x_slot])
                    meta = (
                        _canonicalize_dense(op, w_slot, w_shape, x_aval_shape)
                        if _views_invertible(e.views)
                        else None
                    )
                    if meta is not None:
                        meta["w_views"] = e.views
                        meta["w_views_outer"] = e.outer_views
                        meta["w_leaf_shape"] = tuple(self._param_shapes[e.leaf])
                        meta["w_operand_shape"] = tuple(w_shape)
                        if e.scan is not None:
                            meta["scan"] = {"kind": e.scan[0], "length": e.scan[1]}
                        self._add_layer(
                            "dense", e.leaf, op_index, x_slot, meta, in_scan,
                            in_cond,
                        )
                        produced_by_layer[op.out_keys[0]] = self.layers[-1].layer_id
                        continue
                self._flag(leaf_ids, prim_name)
                continue

            if prim_name == "gather":
                e = entries[0]
                if (
                    e is not None
                    and leaf_ids[1] is None
                    and _views_invertible(e.views)
                    and _is_embedding_gather(op, self._atom_shape(op.in_atoms[0]))
                ):
                    if e.scan is not None and e.scan[0] == "stacked":
                        self._flag(
                            [e.leaf], "gather (scan-stacked embedding tables)"
                        )
                        continue
                    w_shape = self._atom_shape(op.in_atoms[0])
                    d_out = 1
                    for d in w_shape[1:]:
                        d_out *= d
                    meta = {
                        "vocab": w_shape[0],
                        "d_in": w_shape[0],
                        "d_out": d_out,
                        "w_views": e.views,
                        "w_views_outer": e.outer_views,
                        "w_leaf_shape": tuple(self._param_shapes[e.leaf]),
                        "w_operand_shape": tuple(w_shape),
                    }
                    if e.scan is not None:
                        meta["scan"] = {"kind": e.scan[0], "length": e.scan[1]}
                    if in_cond is not None:
                        # masking gather indices would mis-count token 0
                        self._flag(
                            [e.leaf], "cond (embedding lookup inside a cond "
                            "branch)"
                        )
                        continue
                    self._add_layer("embedding", e.leaf, op_index, 1, meta, in_scan)
                    produced_by_layer[op.out_keys[0]] = self.layers[-1].layer_id
                    continue
                self._flag(leaf_ids, prim_name)
                continue

            if prim_name == "conv_general_dilated":
                if (
                    leaf_ids[1] is not None
                    and leaf_ids[0] is None
                    and _views_invertible(entries[1].views)
                ):
                    e = entries[1]
                    w_shape = self._atom_shape(op.in_atoms[1])
                    meta = _conv_meta(op, w_shape)
                    meta["w_views"] = e.views
                    meta["w_views_outer"] = e.outer_views
                    meta["w_leaf_shape"] = tuple(self._param_shapes[e.leaf])
                    if e.scan is not None:
                        meta["scan"] = {"kind": e.scan[0], "length": e.scan[1]}
                    self._add_layer(
                        "conv", e.leaf, op_index, 0, meta, in_scan, in_cond
                    )
                    produced_by_layer[op.out_keys[0]] = self.layers[-1].layer_id
                    continue
                self._flag(leaf_ids, prim_name)
                continue

            if prim_name in ("add", "add_any"):
                # bias pattern: layer_output + broadcast(bias leaf)
                bias_slots = [s for s, lid in enumerate(leaf_ids) if lid is not None]
                other_slots = [s for s in (0, 1) if s not in bias_slots]
                if (
                    len(bias_slots) == 1
                    and other_slots
                    and in_keys[other_slots[0]] in produced_by_layer
                ):
                    lid = produced_by_layer[in_keys[other_slots[0]]]
                    layer = self.layers[lid]
                    e = entries[bias_slots[0]]
                    if layer.kind == "embedding":
                        self._flag(
                            [e.leaf],
                            "add (bias added to an embedding lookup is not "
                            "supported by KFAC)",
                        )
                        continue
                    wscan = layer.meta.get("scan")
                    bscan = e.scan
                    compatible = (wscan is None and bscan is None) or (
                        wscan is not None
                        and bscan is not None
                        and wscan["kind"] == bscan[0]
                        and wscan["length"] == bscan[1]
                    )
                    if not compatible:
                        self._flag(
                            [e.leaf],
                            "add (bias scan mode mismatches its layer's "
                            "weight: stacked weights need stacked biases and "
                            "vice versa)",
                        )
                        continue
                    # the bias must supply exactly one value per output
                    # feature (times the stack length for stacked scans) —
                    # e.g. a (S,)-shaped leaf broadcast over positions is NOT
                    # a layer bias
                    if layer.kind == "dense":
                        d_out = layer.meta["d_out"]
                    else:  # conv: out-channel count from the kernel spec
                        dn = layer.meta["dimension_numbers"]
                        d_out = layer.meta["w_shape"][dn.rhs_spec[0]]
                    stack_len = (
                        bscan[1]
                        if bscan is not None and bscan[0] == "stacked"
                        else 1
                    )
                    leaf_size = math.prod(self._param_shapes[e.leaf])
                    if leaf_size != stack_len * d_out:
                        self._flag(
                            [e.leaf],
                            f"add (bias with {leaf_size} elements cannot be "
                            f"the bias of a layer with {d_out} output "
                            "features)",
                        )
                        continue
                    # the leaf's elements must land on the layer's output-
                    # FEATURE axis with identity ordering: a size match alone
                    # accepts e.g. a position embedding broadcast along the
                    # sequence axis when seq_len == d_out, or a reversed /
                    # transposed bias — silently permuted factors
                    bias_leaf_shape = tuple(self._param_shapes[e.leaf])
                    if bscan is not None and bscan[0] == "stacked":
                        # stacked scans: the in-body view chain applies to
                        # the per-iteration slice, not the full leaf
                        bias_leaf_shape = bias_leaf_shape[1:]
                    elem_axes = _bias_element_axes(e.views, bias_leaf_shape)
                    operand_ndim = len(
                        self._atom_shape(op.in_atoms[bias_slots[0]])
                    )
                    if layer.kind == "conv":
                        # out_spec[1] is the channel position in ANY layout
                        # (NHWC -> trailing, NCHW -> 1); widening to the
                        # trailing axis would accept a per-width offset as a
                        # per-channel bias when W_out == C_out
                        dn = layer.meta["dimension_numbers"]
                        feature_axes = {dn.out_spec[1]}
                    else:
                        feature_axes = {operand_ndim - 1}
                    if elem_axes is None or any(
                        a not in feature_axes for a in elem_axes
                    ):
                        self._flag(
                            [e.leaf],
                            "add (bias does not map onto the layer's output-"
                            "feature axis with identity ordering)",
                        )
                        continue
                    bias_path = self.param_paths[e.leaf]
                    if layer.bias_path is not None:
                        if layer.bias_path != bias_path:
                            raise ValueError(
                                f"Layer {layer.name} has conflicting biases "
                                f"({_path_str(layer.bias_path)} vs "
                                f"{_path_str(bias_path)})."
                            )
                        # the SAME bias added a second time along the layer's
                        # output chain (y = x@W + b + b): the layer equation
                        # has exactly one homogeneous bias, so re-attaching
                        # would silently model only one of the adds (found by
                        # the collector fuzzer, seed 44)
                        self._flag(
                            [e.leaf],
                            "add (bias added more than once to the same "
                            "layer's output)",
                        )
                        continue
                    layer.bias_path = bias_path
                    # bias-add output still carries the layer identity
                    produced_by_layer[op.out_keys[0]] = lid
                    continue
                if (
                    len(bias_slots) == 1
                    and other_slots
                    and entries[other_slots[0]] is None
                ):
                    # bias-only block: a param bias added to a value whose
                    # layer weight is closed over (the reference's
                    # ``exclude='weight'`` configuration — KFAC's bias block
                    # needs only the output gradients, so the weight's
                    # provenance is irrelevant)
                    e = entries[bias_slots[0]]
                    if in_keys[other_slots[0]] in descended:
                        # the operand descends from an in-params layer: this
                        # may be that layer's bias in disguise (reshaped /
                        # post-activation); refuse instead of treating the
                        # broadcast dims as weight sharing
                        self._flag(
                            [e.leaf],
                            "add (bias added to a transformed output of a "
                            "matched layer; a layer bias must be added "
                            "directly to the layer output)",
                        )
                        continue
                    out_shape = tuple(op.out_keys[0][1].aval.shape)
                    leaf_size = math.prod(self._param_shapes[e.leaf])
                    if (
                        in_scan is not None
                        or in_cond is not None
                        or e.scan is not None
                    ):
                        self._flag(
                            [e.leaf],
                            "add (bias-only block inside scan/cond is not "
                            "supported; include the layer's weight in params "
                            "or move the bias out)",
                        )
                        continue
                    if len(out_shape) < 2 or leaf_size != out_shape[-1]:
                        self._flag(
                            [e.leaf],
                            f"add (bias with {leaf_size} elements cannot be "
                            f"the bias of an output with "
                            f"{out_shape[-1] if out_shape else 0} trailing "
                            "features)",
                        )
                        continue
                    if any(v[0] in ("transpose", "rev") for v in e.views):
                        self._flag(
                            [e.leaf], "add (bias view chain reorders elements)"
                        )
                        continue
                    lid = len(self.layers)
                    n = self._kind_counter.setdefault("bias", 0)
                    self._kind_counter["bias"] = n + 1
                    self.layers.append(
                        LayerUse(
                            layer_id=lid,
                            name=f"Bias{n}",
                            kind="dense",
                            weight_path=None,
                            op_index=op_index,
                            input_slot=other_slots[0],
                            meta={
                                "d_in": 0,
                                "d_out": out_shape[-1],
                                "bias_only": True,
                            },
                            bias_path=self.param_paths[e.leaf],
                        )
                    )
                    produced_by_layer[op.out_keys[0]] = lid
                    continue
                self._flag(leaf_ids, prim_name)
                continue

            # any other op consuming a param-derived value is unsupported
            self._flag(leaf_ids, prim_name)

        return derived

    def _add_layer(
        self,
        kind: str,
        leaf: int,
        op_index: int,
        input_slot: int,
        meta: dict,
        in_scan: _ScanInfo | None,
        in_cond: tuple | None = None,
    ) -> None:
        lid = len(self.layers)
        name = f"{kind.capitalize()}{self._kind_counter[kind]}"
        self._kind_counter[kind] += 1
        use = LayerUse(
            layer_id=lid,
            name=name,
            kind=kind,
            weight_path=self.param_paths[leaf],
            op_index=op_index,
            input_slot=input_slot,
            meta=meta,
            scan_op=None if in_scan is None else in_scan.op_index,
            cond_op=None if in_cond is None else in_cond[0].op_index,
            cond_branch=None if in_cond is None else in_cond[1],
        )
        self.layers.append(use)
        if in_scan is not None:
            in_scan.layer_ids.append(lid)
            in_scan.tap_by_op[op_index] = use
        if in_cond is not None:
            info, b = in_cond
            info.branches[b].layer_ids.append(lid)
            info.branches[b].tap_by_op[op_index] = use

    def _analyze_cond(self, op_index: int, op: _Op, entries, leaf_ids) -> None:
        """Match layers inside every branch of a ``cond`` (lower-to-select).

        ``op.invars[0]`` is the branch index; the remaining operands feed
        every branch identically. Each branch is matched recursively; a
        parameter flowing out of the cond is refused.
        """
        info = _CondInfo(op_index=op_index)
        for b, closed_br in enumerate(op.params["branches"]):
            br_ir = _FlatIR(closed_br)
            info.branches.append(_CondBranch(ir=br_ir))
            derived_b: dict[Any, _Derived] = {}
            for pos, e in enumerate(entries[1:]):
                if e is not None:
                    derived_b[br_ir.invar_keys[pos]] = e
            final = self._match_ir(
                br_ir, derived_b, in_scan=None, in_cond=(info, b)
            )
            out_leaves = [
                final[a[1]].leaf
                for a in br_ir.out_atoms
                if a[0] == "var" and a[1] in final
            ]
            if out_leaves:
                self._flag(out_leaves, "cond (parameter flows out of the cond)")
        if any(br.layer_ids for br in info.branches):
            self._cond_infos[op_index] = info

    def _analyze_scan(self, op_index: int, op: _Op, entries, leaf_ids) -> None:
        """Recursively match layers inside a top-level scan body."""
        num_consts = op.params["num_consts"]
        num_carry = op.params["num_carry"]
        length = op.params["length"]
        body_ir = _FlatIR(op.params["jaxpr"])
        info = _ScanInfo(
            op_index=op_index,
            ir=body_ir,
            num_consts=num_consts,
            num_carry=num_carry,
            length=length,
            reverse=op.params.get("reverse", False),
            unroll=op.params.get("unroll", 1),
        )

        body_derived: dict[Any, _Derived] = {}
        for pos, e in enumerate(entries):
            if e is None:
                continue
            key = body_ir.invar_keys[pos]
            if pos < num_consts:
                body_derived[key] = _Derived(
                    e.leaf, e.views, ("shared", length), e.outer_views
                )
            elif pos < num_consts + num_carry:
                self._flag([e.leaf], "scan (parameter enters the loop carry)")
            else:
                if all(v[0] == "convert" for v in e.views):
                    body_derived[key] = _Derived(
                        e.leaf, (), ("stacked", length), e.views
                    )
                else:
                    self._flag(
                        [e.leaf],
                        "scan (stacked parameter is reshaped/transposed "
                        "before the scan; pass the raw stacked leaf)",
                    )

        final = self._match_ir(body_ir, body_derived, in_scan=info)
        # refuse parameters that flow out of the scan — the outer uses would
        # not be tracked, risking silent miscomputation
        out_leaves = [
            final[a[1]].leaf
            for a in body_ir.out_atoms
            if a[0] == "var" and a[1] in final
        ]
        if out_leaves:
            self._flag(out_leaves, "scan (parameter flows out of the scan)")

        if info.layer_ids:
            self._scan_infos[op_index] = info

    def _atom_shape(self, atom):
        if atom[0] == "lit":
            return jnp.shape(atom[1])
        frame, var = atom[1]
        return tuple(var.aval.shape)

    # ------------------------------------------------------------------ #
    # tapped re-interpretation
    # ------------------------------------------------------------------ #
    def delta_specs(self, params: Any, X: Any) -> list[jax.ShapeDtypeStruct]:
        """Shapes of the per-layer pre-bias outputs (for the delta inputs).

        Scan layers get a leading scan-length axis: their delta is scanned in
        as an extra ``xs`` input, one slice per iteration.
        """
        ir_shapes = []
        for use in self.layers:
            if use.scan_op is not None:
                info = self._scan_infos[use.scan_op]
                aval = info.ir.ops[use.op_index].out_keys[0][1].aval
                ir_shapes.append(
                    jax.ShapeDtypeStruct(
                        (info.length, *aval.shape), aval.dtype
                    )
                )
            elif use.cond_op is not None:
                cinfo = self._cond_infos[use.cond_op]
                branch = cinfo.branches[use.cond_branch]
                aval = branch.ir.ops[use.op_index].out_keys[0][1].aval
                ir_shapes.append(
                    jax.ShapeDtypeStruct(tuple(aval.shape), aval.dtype)
                )
            else:
                aval = self._ir.ops[use.op_index].out_keys[0][1].aval
                ir_shapes.append(jax.ShapeDtypeStruct(tuple(aval.shape), aval.dtype))
        return ir_shapes

    def apply_with_io(
        self, params: Any, deltas: list[jax.Array], X: Any, frozen: Any = None
    ) -> tuple[Any, list[jax.Array], list[jax.Array]]:
        """Run the model; return ``(prediction, layer_inputs, layer_gates)``.

        ``deltas[i]`` is added to layer ``i``'s pre-bias output (scanned in
        per-iteration for scan layers), so differentiating w.r.t. ``deltas``
        yields the layer-output gradients. ``frozen`` defaults to the pytree
        captured at trace time; kernels should pass it explicitly so it
        enters their jit as an argument.

        ``layer_gates[i]`` is a stop-gradient float scalar: 1 except for
        layers inside a ``cond`` branch, where it is the branch-taken
        indicator — the factor kernels scale layer ``i``'s input-covariance
        contribution by it (an untaken layer contributes a zero Fisher
        block).
        """
        frozen = self._frozen if frozen is None else frozen
        args_flat = (
            tree_util.tree_leaves(frozen)
            + tree_util.tree_leaves(params)
            + tree_util.tree_leaves(X)
        )
        if len(args_flat) != len(self._ir.invar_keys):
            raise ValueError(
                f"Expected {len(self._ir.invar_keys)} flat inputs, "
                f"got {len(args_flat)}."
            )
        delta_by_layer = {u.layer_id: deltas[u.layer_id] for u in self.layers}
        tap_store: dict[int, jax.Array] = {}
        gate_store: dict[int, jax.Array] = {}
        out_vals = self._run_ir(
            self._ir,
            args_flat,
            self._top_tap_by_op,
            delta_by_layer,
            tap_store,
            self._scan_infos,
            self._cond_infos,
            gate_store,
        )
        pred = tree_util.tree_unflatten(self._out_tree, out_vals)
        one = jnp.ones((), jnp.float32)
        return (
            pred,
            [tap_store[u.layer_id] for u in self.layers],
            [gate_store.get(u.layer_id, one) for u in self.layers],
        )

    def _run_ir(
        self,
        ir: _FlatIR,
        in_vals: list,
        tap_by_op: dict,
        delta_by_layer: dict,
        tap_store: dict,
        scan_infos: dict | None,
        cond_infos: dict | None = None,
        gate_store: dict | None = None,
    ) -> list:
        """Interpret one IR, adding deltas at taps and rebuilding scans."""
        env: dict = ir.const_env
        for key, val in zip(ir.invar_keys, in_vals):
            env[key] = val

        def read(atom):
            return atom[1] if atom[0] == "lit" else env[atom[1]]

        for op_index, op in enumerate(ir.ops):
            vals = [read(a) for a in op.in_atoms]
            if op.prim is None:  # alias
                env[op.out_keys[0]] = vals[0]
                continue
            if scan_infos and op_index in scan_infos:
                info = scan_infos[op_index]
                consts = vals[: info.num_consts]
                carry0 = vals[info.num_consts : info.num_consts + info.num_carry]
                xs = vals[info.num_consts + info.num_carry :]
                n_xs = len(xs)
                layer_deltas = tuple(
                    delta_by_layer[lid] for lid in info.layer_ids
                )

                def body(carry, scanned, _info=info, _consts=consts, _n_xs=n_xs):
                    x_sl = scanned[:_n_xs]
                    d_sl = scanned[_n_xs:]
                    inner_deltas = dict(zip(_info.layer_ids, d_sl))
                    inner_taps: dict = {}
                    outs = self._run_ir(
                        _info.ir,
                        list(_consts) + list(carry) + list(x_sl),
                        _info.tap_by_op,
                        inner_deltas,
                        inner_taps,
                        None,
                    )
                    new_carry = tuple(outs[: _info.num_carry])
                    ys = tuple(outs[_info.num_carry :])
                    taps = tuple(inner_taps[lid] for lid in _info.layer_ids)
                    return new_carry, (ys, taps)

                final_carry, (ys, taps) = jax.lax.scan(
                    body,
                    tuple(carry0),
                    tuple(xs) + layer_deltas,
                    length=info.length,
                    reverse=info.reverse,
                    unroll=info.unroll,
                )
                outs = list(final_carry) + list(ys)
                for k, o in zip(op.out_keys, outs):
                    env[k] = o
                for lid, tap in zip(info.layer_ids, taps):
                    tap_store[lid] = tap
                continue
            if cond_infos and op_index in cond_infos:
                cinfo = cond_infos[op_index]
                index = vals[0]
                operands = list(vals[1:])
                branch_outs = []
                for b, branch in enumerate(cinfo.branches):
                    taps_b: dict = {}
                    outs_b = self._run_ir(
                        branch.ir,
                        list(operands),
                        branch.tap_by_op,
                        delta_by_layer,
                        taps_b,
                        None,
                        None,
                    )
                    branch_outs.append(outs_b)
                    # gate the untaken branch's layers: the factor kernel
                    # multiplies their aaT contribution by the gate (its
                    # deltas are selected away below, so ggT contributions
                    # vanish through autodiff). Gating the covariance rather
                    # than the tap keeps the joint-group bias pad correct.
                    gate = jax.lax.stop_gradient(
                        (index == b).astype(jnp.float32)
                    )
                    for lid, tap in taps_b.items():
                        tap_store[lid] = tap
                        gate_store[lid] = gate
                outs = [
                    jax.lax.select_n(index, *[bo[j] for bo in branch_outs])
                    for j in range(len(op.out_keys))
                ]
                for k, o in zip(op.out_keys, outs):
                    env[k] = o
                continue

            ans = op.prim.bind(*vals, **op.params)
            outs = ans if op.prim.multiple_results else [ans]
            if op_index in tap_by_op:
                use = tap_by_op[op_index]
                tap_store[use.layer_id] = vals[use.input_slot]
                outs = [outs[0] + delta_by_layer[use.layer_id]] + list(outs[1:])
            for k, o in zip(op.out_keys, outs):
                env[k] = o

        return [read(a) for a in ir.out_atoms]
