"""Pytree <-> flat-vector conversion helpers.

The TPU-native analogue of the reference's tensor-list/flat-tensor input formats
(``curvlinops/_torch_base.py:208-427``): linear operators map *pytrees* to
*pytrees*; flat ``[N]`` / ``[N, K]`` arrays are accepted at the edge and
converted with ``jax.flatten_util.ravel_pytree``.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def spec_of(tree: Any) -> Any:
    """Return a pytree of ``jax.ShapeDtypeStruct`` describing ``tree``."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def spec_size(spec: Any) -> int:
    """Total number of scalar entries described by a spec pytree."""
    return sum(math.prod(leaf.shape) for leaf in jax.tree.leaves(spec))


def spec_dtype(spec: Any):
    """Common dtype of the spec's leaves (result-type promotion)."""
    leaves = jax.tree.leaves(spec)
    if not leaves:
        raise ValueError("Empty spec has no dtype.")
    return jnp.result_type(*[leaf.dtype for leaf in leaves])


def zeros_like_spec(spec: Any) -> Any:
    """Materialize a pytree of zeros matching a spec."""
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), spec)


def make_ravel_unravel(spec: Any) -> tuple[Callable, Callable]:
    """Build ``(ravel, unravel)`` between a spec pytree and flat vectors.

    ``ravel(tree) -> [N]`` and ``unravel(vec[N]) -> tree``. Both are pure and
    jit-traceable.
    """
    template = zeros_like_spec(spec)
    _, unravel = ravel_pytree(template)

    def ravel(tree: Any) -> jax.Array:
        return ravel_pytree(tree)[0]

    return ravel, unravel


def make_ravel_unravel_cols(spec: Any) -> tuple[Callable, Callable]:
    """Build ``(ravel_cols, unravel_cols)`` for matrices.

    ``unravel_cols(mat[N, K]) -> tree`` whose leaves carry a trailing column
    axis ``K``; ``ravel_cols`` is the inverse.
    """
    ravel, unravel = make_ravel_unravel(spec)
    # jitted: the whole (un)flatten is ONE dispatch instead of one per leaf,
    # which matters when the host->device link has per-op latency
    unravel_cols = jax.jit(jax.vmap(unravel, in_axes=1, out_axes=-1))
    ravel_cols = jax.jit(jax.vmap(ravel, in_axes=-1, out_axes=1))
    return ravel_cols, unravel_cols


def tree_add(a: Any, b: Any) -> Any:
    """Leafwise sum of two pytrees."""
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a: Any, b: Any) -> Any:
    """Leafwise difference of two pytrees."""
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(c, tree: Any) -> Any:
    """Scale every leaf of a pytree by a scalar."""
    return jax.tree.map(lambda x: c * x, tree)


def tree_vdot(a: Any, b: Any) -> jax.Array:
    """Inner product of two pytrees."""
    parts = jax.tree.leaves(
        jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b)
    )
    return sum(parts[1:], parts[0])


def tree_conj(tree: Any) -> Any:
    """Leafwise complex conjugate."""
    return jax.tree.map(jnp.conj, tree)


def vmap_columns(fn: Callable, M: Any, max_columns: int | None = None) -> Any:
    """vmap ``fn`` over the trailing column axis, optionally in chunks.

    vmapping a (H/GGN/Fisher)-vector product over K matmat columns multiplies
    residual memory by K (SURVEY.md hard part #5); ``max_columns`` bounds the
    live chunk while keeping everything inside one jitted program (the chunk
    loop unrolls at trace time — K is static under jit).
    """
    K = jax.tree.leaves(M)[0].shape[-1]
    if max_columns is None or K <= max_columns:
        return jax.vmap(fn, in_axes=-1, out_axes=-1)(M)
    outs = []
    for start in range(0, K, max_columns):
        stop = min(start + max_columns, K)
        chunk = jax.tree.map(lambda leaf: leaf[..., start:stop], M)
        outs.append(jax.vmap(fn, in_axes=-1, out_axes=-1)(chunk))
    return jax.tree.map(lambda *parts: jnp.concatenate(parts, axis=-1), *outs)


def tree_randn_like(key: jax.Array, spec: Any, scale: float = 1.0) -> Any:
    """Standard-normal pytree matching a spec (for determinism probes/tests)."""
    leaves, treedef = jax.tree.flatten(spec)
    keys = jax.random.split(key, len(leaves))
    vals = [
        scale * jax.random.normal(k, s.shape, s.dtype) for k, s in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, vals)
