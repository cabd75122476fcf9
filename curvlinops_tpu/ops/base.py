"""Matrix-free linear operators over pytree spaces.

TPU-native re-design of the reference's ``PyTorchLinearOperator``
(``curvlinops/_torch_base.py:33-814``): an operator maps a pytree of arrays
(the "tensor-list" of the reference generalized to arbitrary pytrees) to a
pytree of arrays. Flat ``[N]`` / ``[N, K]`` jax or numpy arrays are accepted at
the edge; the result is returned in the caller's format. Operator algebra
(``+``, scalar ``*``/``/``, ``@``-chaining, adjoint, negation) is lazy.

Unlike the reference, adjoints of traceable operators come for free via
``jax.linear_transpose``, and ``todense`` / SciPy export are thin edges around
pure jitted matmats.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.utils.flatten import (
    make_ravel_unravel_cols,
    spec_dtype,
    spec_size,
    tree_add,
    tree_randn_like,
    tree_scale,
    zeros_like_spec,
)

# epoch counter for traced-form invalidation (see
# LinearOperator.invalidate_traced); solver program caches key on it too
_TRACED_EPOCH = [0]


def traced_epoch() -> int:
    """Current global traced-form epoch (for solver program cache keys)."""
    return _TRACED_EPOCH[0]


def cached_program(A, key: tuple, builder):
    """Build-once jitted program stored on the operator instance.

    The cache holds programs for the CURRENT traced epoch only: bumping the
    epoch (``invalidate_traced``, solver hyperparameter changes) evicts every
    stale entry instead of stranding compiled programs — and the operator
    state tuples they pin — in the instance dict forever.
    """
    epoch = traced_epoch()
    try:
        stored = A.__dict__.get("_program_cache")
    except AttributeError:  # plain arrays have no instance dict
        return builder()
    if stored is None or stored[0] != epoch:
        stored = (epoch, {})
        A._program_cache = stored
    cache = stored[1]
    if key not in cache:
        cache[key] = builder()
    return cache[key]


@jax.jit
def _add_col_axis(tree: Any) -> Any:
    """Append a singleton column axis to every leaf — ONE dispatch.

    The per-leaf eager version cost ~60 device round trips per operator
    call on ResNet-sized pytrees over the tunnel (~0.3 s per solve,
    `benchmarks/profile_solver_gap.py`); jitting the whole map makes the
    tree-format edge a single program like the flat edge already is.
    """
    return jax.tree.map(lambda leaf: jnp.asarray(leaf)[..., None], tree)


@jax.jit
def _drop_col_axis(tree: Any) -> Any:
    """Inverse of :func:`_add_col_axis` (leafwise ``[..., 0]``), jitted."""
    return jax.tree.map(lambda leaf: leaf[..., 0], tree)


# Input/output format tokens
_FMT_TREE = "tree"  # pytree matching the spec, no column axis
_FMT_TREE_COLS = "tree_cols"  # pytree with trailing column axis on every leaf
_FMT_FLAT_VEC = "flat_vec"  # [N]
_FMT_FLAT_MAT = "flat_mat"  # [N, K]
_FMT_NP_VEC = "np_vec"
_FMT_NP_MAT = "np_mat"


class LinearOperator:
    """Base class for matrix-free linear operators between pytree spaces.

    Subclasses implement ``_matmat`` (pytree with a trailing column axis on
    every leaf -> same for the output space) and, unless ``SELF_ADJOINT``,
    ``_adjoint``.
    """

    SELF_ADJOINT: bool = False

    # make numpy defer `ndarray @ op` to our __rmatmul__
    __array_ufunc__ = None
    __array_priority__ = 100.0

    def __init__(self, in_spec: Any, out_spec: Any | None = None):
        """Store input/output space specs (pytrees of ``ShapeDtypeStruct``)."""
        self._in_spec = in_spec
        self._out_spec = in_spec if out_spec is None else out_spec
        self._in_size = spec_size(self._in_spec)
        self._out_size = spec_size(self._out_spec)
        self._ravel_in = self._unravel_in = None
        self._ravel_out = self._unravel_out = None

    # ------------------------------------------------------------------ #
    # Introspection
    # ------------------------------------------------------------------ #
    @property
    def in_spec(self) -> Any:
        """Pytree of ``ShapeDtypeStruct`` describing the input space."""
        return self._in_spec

    @property
    def out_spec(self) -> Any:
        """Pytree of ``ShapeDtypeStruct`` describing the output space."""
        return self._out_spec

    @property
    def shape(self) -> tuple[int, int]:
        """Flat ``(out_dim, in_dim)`` shape."""
        return (self._out_size, self._in_size)

    @property
    def dtype(self):
        """Common dtype of the input-space leaves."""
        return spec_dtype(self._in_spec)

    def __repr__(self) -> str:  # noqa: D105
        return f"<{self.shape[0]}x{self.shape[1]} {type(self).__name__}>"

    # ------------------------------------------------------------------ #
    # Core contract
    # ------------------------------------------------------------------ #
    def _matmat(self, M: Any) -> Any:
        """Apply the operator to a pytree whose leaves carry a trailing column axis."""
        raise NotImplementedError

    def _adjoint(self) -> "LinearOperator":
        """Return the adjoint operator."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement an adjoint."
        )

    # ------------------------------------------------------------------ #
    # Format handling
    # ------------------------------------------------------------------ #
    def _edge(self, which: str):
        """Lazily build and cache (ravel_cols, unravel_cols) for one side."""
        if which == "in":
            if self._ravel_in is None:
                self._ravel_in, self._unravel_in = make_ravel_unravel_cols(
                    self._in_spec
                )
            return self._ravel_in, self._unravel_in
        if self._ravel_out is None:
            self._ravel_out, self._unravel_out = make_ravel_unravel_cols(
                self._out_spec
            )
        return self._ravel_out, self._unravel_out

    def _classify(self, x: Any, spec: Any, size: int) -> str:
        """Determine the format of an input ``x`` against a space spec."""
        if isinstance(x, np.ndarray):
            if x.ndim == 1 and x.shape[0] == size:
                return _FMT_NP_VEC
            if x.ndim == 2 and x.shape[0] == size:
                return _FMT_NP_MAT
            raise ValueError(
                f"NumPy input must be [{size}] or [{size}, K], got {x.shape}."
            )
        spec_leaves, spec_def = jax.tree.flatten(spec)
        # a bare array against a SINGLE rank-1 leaf spec is ambiguous (tree
        # and flat interpretations coincide on the input); classify as FLAT
        # so the RESULT comes back in the documented array-at-the-edge
        # format — e.g. J^T of a single-leaf input space must return a flat
        # [P] vector, not the params pytree
        if (
            (isinstance(x, jax.Array) or not isinstance(x, (dict, list, tuple)))
            and hasattr(x, "shape")
            and len(spec_leaves) == 1
            and len(spec_leaves[0].shape) == 1
        ):
            shp = jnp.shape(x)
            if len(shp) == 1 and shp[0] == size:
                return _FMT_FLAT_VEC
            if len(shp) == 2 and shp[0] == size:
                return _FMT_FLAT_MAT
        try:
            x_leaves, x_def = jax.tree.flatten(x)
        except Exception:
            raise ValueError(f"Cannot flatten input of type {type(x)}.") from None
        if x_def == spec_def and len(x_leaves) == len(spec_leaves):
            shapes = [jnp.shape(leaf) for leaf in x_leaves]
            if all(s == sp.shape for s, sp in zip(shapes, spec_leaves)):
                return _FMT_TREE
            ncols = {
                s[-1]
                for s, sp in zip(shapes, spec_leaves)
                if s[:-1] == sp.shape and len(s) == len(sp.shape) + 1
            }
            if len(ncols) == 1 and all(
                s[:-1] == sp.shape for s, sp in zip(shapes, spec_leaves)
            ):
                return _FMT_TREE_COLS
        # bare array interpreted as flat vector/matrix
        if isinstance(x, (jax.Array,)) or hasattr(x, "shape"):
            shp = jnp.shape(x)
            if len(shp) == 1 and shp[0] == size:
                return _FMT_FLAT_VEC
            if len(shp) == 2 and shp[0] == size:
                return _FMT_FLAT_MAT
        raise ValueError(
            f"Input does not match the operator's space: expected a pytree with "
            f"structure/shapes {jax.tree.map(lambda s: s.shape, spec)} (optionally "
            f"with a trailing column axis) or a flat [{size}]/[{size}, K] array; "
            f"got shapes {jax.tree.map(jnp.shape, x)}."
        )

    def _to_cols(self, x: Any, fmt: str, which: str) -> Any:
        """Convert an input in format ``fmt`` to a pytree with a column axis."""
        _, unravel_cols = self._edge(which)
        if fmt == _FMT_TREE:
            return _add_col_axis(x)
        if fmt == _FMT_TREE_COLS:
            return x
        if fmt in (_FMT_FLAT_VEC, _FMT_NP_VEC):
            flat = jnp.asarray(x, dtype=self.dtype)[:, None]
            return unravel_cols(flat)
        flat = jnp.asarray(x, dtype=self.dtype)
        return unravel_cols(flat)

    def _from_cols(self, M: Any, fmt: str, which: str) -> Any:
        """Convert a column-axis pytree back to the caller's format."""
        ravel_cols, _ = self._edge(which)
        if fmt == _FMT_TREE:
            return _drop_col_axis(M)
        if fmt == _FMT_TREE_COLS:
            return M
        flat = ravel_cols(M)
        if fmt == _FMT_FLAT_VEC:
            return flat[:, 0]
        if fmt == _FMT_FLAT_MAT:
            return flat
        out = np.asarray(jax.device_get(flat.astype(jnp.float32)
                                        if flat.dtype == jnp.bfloat16 else flat))
        return out[:, 0] if fmt == _FMT_NP_VEC else out

    # ------------------------------------------------------------------ #
    # Multiplication
    # ------------------------------------------------------------------ #
    def __matmul__(self, other: Any) -> Any:
        if isinstance(other, LinearOperator):
            if self.shape[1] != other.shape[0]:
                raise ValueError(
                    f"Shape mismatch in operator chain: {self.shape} @ {other.shape}."
                )
            return ChainLinearOperator(_flatten_chain([self, other]))
        fmt = self._classify(other, self._in_spec, self._in_size)
        M = self._to_cols(other, fmt, "in")
        out = self._matmat(M)
        return self._from_cols(out, fmt, "out")

    def __rmatmul__(self, other: Any) -> Any:
        """``X @ A`` via ``(A^H X^H)^H`` (flat/numpy matrix or vector only)."""
        adj = self.adjoint()
        if isinstance(other, np.ndarray) or hasattr(other, "shape"):
            arr = other
            if arr.ndim == 1:
                # v @ A = A^T v = conj(A^H conj(v)) for complex inputs
                if np.iscomplexobj(arr):
                    return (adj @ arr.conj()).conj()
                return adj @ arr
            if arr.ndim == 2 and arr.shape[1] == self.shape[0]:
                res = adj @ (arr.conj().T if np.iscomplexobj(arr) else arr.T)
                return res.conj().T if np.iscomplexobj(arr) else res.T
        raise ValueError(
            f"Left multiplication expects [K, {self.shape[0]}] or [{self.shape[0]}]."
        )

    def matvec_tree(self, v: Any) -> Any:
        """Apply to a pytree vector, returning a pytree (no format dance)."""
        return _drop_col_axis(self._matmat(_add_col_axis(v)))

    # ------------------------------------------------------------------ #
    # Algebra
    # ------------------------------------------------------------------ #
    def __add__(self, other: "LinearOperator") -> "LinearOperator":
        if not isinstance(other, LinearOperator):
            return NotImplemented
        return SumLinearOperator(self, other)

    def __sub__(self, other: "LinearOperator") -> "LinearOperator":
        if not isinstance(other, LinearOperator):
            return NotImplemented
        return SumLinearOperator(self, ScaledLinearOperator(other, -1.0))

    def __mul__(self, scalar) -> "LinearOperator":
        if not isinstance(scalar, (int, float, complex, jax.Array, np.ndarray)):
            return NotImplemented
        if isinstance(scalar, (jax.Array, np.ndarray)) and jnp.ndim(scalar):
            # a non-0d array would broadcast against every leaf's column
            # axis — a silently wrong (and no longer self-adjoint) operator
            raise ValueError(
                f"Operator scaling requires a scalar, got an array of shape "
                f"{jnp.shape(scalar)}. Use DiagonalLinearOperator @ op for "
                "elementwise scaling."
            )
        return ScaledLinearOperator(self, scalar)

    __rmul__ = __mul__

    def __truediv__(self, scalar) -> "LinearOperator":
        return self.__mul__(1.0 / scalar)

    def __neg__(self) -> "LinearOperator":
        return ScaledLinearOperator(self, -1.0)

    def adjoint(self) -> "LinearOperator":
        """Adjoint operator (self when ``SELF_ADJOINT``)."""
        return self if self.SELF_ADJOINT else self._adjoint()

    @property
    def T(self) -> "LinearOperator":
        """Transpose (== adjoint for real operators)."""
        return self.adjoint()

    # ------------------------------------------------------------------ #
    # Materialization / export
    # ------------------------------------------------------------------ #
    def todense(self, col_chunk: int | None = None) -> jax.Array:
        """Materialize as a dense ``[out_dim, in_dim]`` array (tests/small ops)."""
        n = self.shape[1]
        chunk = n if col_chunk is None else col_chunk
        blocks = []
        for start in range(0, n, chunk):
            stop = min(start + chunk, n)
            eye = jnp.zeros((n, stop - start), self.dtype)
            eye = eye.at[jnp.arange(start, stop), jnp.arange(stop - start)].set(1)
            blocks.append(self @ eye)
        return jnp.concatenate(blocks, axis=1)

    def to_scipy(self, dtype=None):
        """Export as a ``scipy.sparse.linalg.LinearOperator`` (host escape hatch).

        API-parity with the reference's ``to_scipy`` (``_torch_base.py:491``);
        nothing inside this package uses it — spectral/least-squares solves run
        on-device (see ``curvlinops_tpu.solvers``).
        """
        from scipy.sparse.linalg import LinearOperator as ScipyLinearOperator

        adj = self.adjoint()
        np_dtype = np.dtype(dtype) if dtype is not None else (
            np.float32 if self.dtype == jnp.bfloat16 else np.dtype(self.dtype)
        )

        def matmat(X: np.ndarray) -> np.ndarray:
            return np.asarray(self @ np.asarray(X), dtype=np_dtype)

        def rmatmat(X: np.ndarray) -> np.ndarray:
            return np.asarray(adj @ np.asarray(X), dtype=np_dtype)

        return ScipyLinearOperator(
            self.shape,
            matvec=lambda v: matmat(v.reshape(-1, 1)).ravel(),
            rmatvec=lambda v: rmatmat(v.reshape(-1, 1)).ravel(),
            matmat=matmat,
            rmatmat=rmatmat,
            dtype=np_dtype,
        )

    # ------------------------------------------------------------------ #
    # Traced form (constant hoisting for fused solver programs)
    # ------------------------------------------------------------------ #
    def traced(self, ncols: int = 1) -> tuple[Callable, tuple]:
        """Return ``(fn, consts)`` with ``fn(M, *consts) == self._matmat(M)``.

        ``fn`` is pure and jit-traceable; every array the operator closes over
        (parameters, data batches, curvature factors, ...) is hoisted out of a
        trace of ``_matmat`` into ``consts`` so callers can thread them through
        ``jax.jit`` as ARGUMENTS. This is the library-wide mechanism that lets
        iterative solvers (Neumann, CG, LSMR, Lanczos, LOBPCG) fuse an entire
        solve — including every operator application — into ONE XLA program
        without baking large constants into the compiled HLO (remote-compile
        services reject >~100MB request bodies; see ``utils.misc.FrozenModelFn``
        for the same policy on the per-batch kernels).

        ``M`` must carry exactly ``ncols`` trailing columns (the trace is
        shape-specialized). Results are cached per ``ncols``; call
        :meth:`invalidate_traced` after mutating operator state in place.
        """
        cache = self.__dict__.setdefault("_traced_cache", {})
        if any(e[2] != _TRACED_EPOCH[0] for e in cache.values()):
            # some operator was mutated since: drop EVERY stale entry, not
            # just the requested ncols — other widths' consts tuples pin the
            # old params and the stacked dataset otherwise
            cache.clear()
        entry = cache.get(ncols)
        if entry is None:
            example = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(s.shape + (ncols,), s.dtype),
                self._in_spec,
            )
            flat_ex, in_tree = jax.tree.flatten(example)
            out_tree_store = []

            def flat_fn(*flat_M):
                M = jax.tree.unflatten(in_tree, flat_M)
                out = self._matmat(M)
                flat_out, out_tree = jax.tree.flatten(out)
                out_tree_store.append(out_tree)
                return flat_out

            closed = jax.make_jaxpr(flat_fn)(*flat_ex)
            jaxpr, consts = closed.jaxpr, tuple(closed.consts)
            out_tree = out_tree_store[0]
            from jax.core import eval_jaxpr

            def fn(M, *consts, _jaxpr=jaxpr, _in=in_tree, _out=out_tree):
                flat_M, got_tree = jax.tree.flatten(M)
                if got_tree != _in:
                    raise ValueError(
                        "traced operator input has a different pytree "
                        f"structure: expected {_in}, got {got_tree}."
                    )
                out_flat = eval_jaxpr(_jaxpr, consts, *flat_M)
                return jax.tree.unflatten(_out, out_flat)

            cache[ncols] = entry = (fn, consts, _TRACED_EPOCH[0])
        return entry[0], entry[1]

    def traced_flat(self, ncols: int = 1) -> tuple[Callable, tuple]:
        """Like :meth:`traced` but on flat ``[in_dim, ncols]`` matrices,
        returning flat ``[out_dim, ncols]`` results."""
        fn, consts = self.traced(ncols)
        ravel_out, _ = self._edge("out")
        _, unravel_in = self._edge("in")

        def flat_fn(Mflat, *consts):
            return ravel_out(fn(unravel_in(Mflat), *consts))

        return flat_fn, consts

    def invalidate_traced(self) -> None:
        """Drop cached traced forms (call after in-place state mutation).

        Bumps a GLOBAL epoch: a composite operator's trace embeds its
        children's computation, and children hold no parent links, so a
        child mutation must invalidate every cached trace. Mutations are
        rare (``load_state_dict``, chain ``__setitem__``, solver
        hyperparameter changes); the cost is a re-trace on next use.
        """
        _TRACED_EPOCH[0] += 1
        self.__dict__.pop("_traced_cache", None)

    # ------------------------------------------------------------------ #
    # Safety rails
    # ------------------------------------------------------------------ #
    def check_deterministic_matvec(
        self, seed: int = 0, rtol: float = 5e-5, atol: float = 1e-6
    ) -> None:
        """Probe determinism with two identical matvecs (``_torch_base.py:542``).

        Raises:
            RuntimeError: If the two results differ beyond tolerance.
        """
        v = tree_randn_like(jax.random.key(seed), self._in_spec)
        r1 = jax.tree.leaves(self.matvec_tree(v))
        r2 = jax.tree.leaves(self.matvec_tree(v))
        for a, b in zip(r1, r2):
            if not np.allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol):
                raise RuntimeError(
                    "Check for deterministic matvec failed: two applications of "
                    "the operator to the same vector differ."
                )


class PytreeLinearOperator(LinearOperator):
    """Operator defined by a traceable linear function on pytrees.

    The adjoint is derived automatically with ``jax.linear_transpose`` — the
    JAX-native replacement for hand-written ``_adjoint`` implementations.
    """

    def __init__(
        self,
        matvec: Callable[[Any], Any],
        in_spec: Any,
        out_spec: Any | None = None,
        self_adjoint: bool = False,
    ):
        super().__init__(in_spec, out_spec)
        self._matvec_fn = matvec
        self.SELF_ADJOINT = self_adjoint

    def _matmat(self, M: Any) -> Any:
        return jax.vmap(self._matvec_fn, in_axes=-1, out_axes=-1)(M)

    def _adjoint(self) -> "LinearOperator":
        primal = zeros_like_spec(self._in_spec)
        transpose = jax.linear_transpose(self._matvec_fn, primal)

        def rmatvec(w: Any) -> Any:
            return transpose(w)[0]

        return PytreeLinearOperator(rmatvec, self._out_spec, self._in_spec)


def _specs_compatible(a: Any, b: Any) -> bool:
    """Same pytree structure and leaf shapes (dtypes may differ)."""
    if jax.tree.structure(a) != jax.tree.structure(b):
        return False
    return all(
        la.shape == lb.shape
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _check_same_space(a: Any, b: Any, what: str) -> None:
    """Refuse composing operators over structurally different spaces.

    Flat sizes matching is NOT enough: summing/chaining a pytree-space
    curvature operator with a flat-space matrix operator would pass the
    size check and then crash (or silently mis-shape) deep inside a jit
    trace when the wrong structure reaches the other's ``_matmat``.
    """
    if not _specs_compatible(a, b):
        raise ValueError(
            f"{what}: operator spaces have the same flat size but different "
            f"pytree structure/shapes "
            f"({jax.tree.map(lambda s: s.shape, a)} vs "
            f"{jax.tree.map(lambda s: s.shape, b)}). Wrap one side to the "
            "other's space (e.g. via to_scipy()/todense for flat interop)."
        )


class SumLinearOperator(LinearOperator):
    """Lazy sum ``A + B`` (``_torch_base.py:595``)."""

    def __init__(self, A: LinearOperator, B: LinearOperator):
        if A.shape != B.shape:
            raise ValueError(f"Cannot add operators of shapes {A.shape}, {B.shape}.")
        _check_same_space(A.in_spec, B.in_spec, "A + B (input space)")
        _check_same_space(A.out_spec, B.out_spec, "A + B (output space)")
        super().__init__(A.in_spec, A.out_spec)
        self._A, self._B = A, B
        self.SELF_ADJOINT = A.SELF_ADJOINT and B.SELF_ADJOINT

    def _matmat(self, M: Any) -> Any:
        return tree_add(self._A._matmat(M), self._B._matmat(M))

    def _adjoint(self) -> LinearOperator:
        return SumLinearOperator(self._A.adjoint(), self._B.adjoint())


class ScaledLinearOperator(LinearOperator):
    """Lazy scalar multiple ``c * A`` (``_torch_base.py:652``)."""

    def __init__(self, A: LinearOperator, scalar):
        super().__init__(A.in_spec, A.out_spec)
        self._A, self._scalar = A, scalar
        # np.iscomplexobj also catches np.complex64/128 and 0-d complex
        # jax/numpy arrays, which isinstance(_, complex) misses
        self.SELF_ADJOINT = A.SELF_ADJOINT and not np.iscomplexobj(scalar)

    def _matmat(self, M: Any) -> Any:
        return tree_scale(self._scalar, self._A._matmat(M))

    def _adjoint(self) -> LinearOperator:
        c = np.conj(self._scalar) if np.iscomplexobj(self._scalar) else self._scalar
        return ScaledLinearOperator(self._A.adjoint(), c)


def _flatten_chain(ops: Sequence[LinearOperator]) -> list[LinearOperator]:
    """Flatten nested chains (``_torch_base.py:149-157``)."""
    flat: list[LinearOperator] = []
    for op in ops:
        if isinstance(op, ChainLinearOperator):
            flat.extend(op.ops)
        else:
            flat.append(op)
    return flat


class ChainLinearOperator(LinearOperator):
    """Lazy product ``A_1 @ A_2 @ ... @ A_k``, applied right-to-left."""

    def __init__(self, ops: Sequence[LinearOperator]):
        ops = _flatten_chain(ops)
        if not ops:
            raise ValueError("Chain requires at least one operator.")
        for left, right in zip(ops[:-1], ops[1:]):
            if left.shape[1] != right.shape[0]:
                raise ValueError(
                    f"Chain shape mismatch: {left.shape} @ {right.shape}."
                )
            _check_same_space(
                left.in_spec, right.out_spec, "A @ B (inner space)"
            )
        super().__init__(ops[-1].in_spec, ops[0].out_spec)
        self.ops = list(ops)

    def __len__(self) -> int:  # noqa: D105
        return len(self.ops)

    def __getitem__(self, idx: int) -> LinearOperator:  # noqa: D105
        return self.ops[idx]

    def __setitem__(self, idx: int, op: LinearOperator) -> None:
        """Replace a chain element, validating shape compatibility."""
        old = self.ops[idx]
        if op.shape != old.shape:
            raise ValueError(
                f"Replacement operator has shape {op.shape}, expected {old.shape}."
            )
        _check_same_space(op.in_spec, old.in_spec, "chain[i] = op (input)")
        _check_same_space(op.out_spec, old.out_spec, "chain[i] = op (output)")
        self.ops[idx] = op
        self.invalidate_traced()

    def _matmat(self, M: Any) -> Any:
        for op in reversed(self.ops):
            M = op._matmat(M)
        return M

    def _adjoint(self) -> LinearOperator:
        return ChainLinearOperator([op.adjoint() for op in reversed(self.ops)])
