"""Device-mesh utilities for data-parallel curvature computation.

The parallelism the reference lists as a future idea (``README.md:71``),
built the TPU way (SURVEY.md §2.5): batches are sharded over a mesh's data
axis with ``NamedSharding``, parameters are replicated, and the jitted
per-batch kernels are partitioned by GSPMD — XLA inserts the ``psum`` over
ICI at the two reduction points the math has (matmat accumulation and
KFAC covariance einsums). Multi-host runs ride the same collectives over DCN.
"""

from __future__ import annotations

import operator
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Args:
        n_devices: Number of devices (all available if ``None``).
        axis_names: Mesh axis names; default is a 1D data axis.
        shape: Per-axis sizes; default puts all devices on the first axis.

    Returns:
        A ``jax.sharding.Mesh``.
    """
    if n_devices is not None:
        try:  # accept anything int-like (numpy integers, 0-d arrays)
            n_devices = operator.index(n_devices)
        except TypeError:
            raise TypeError(
                "make_mesh's first argument is n_devices (an int); pass "
                f"axis names as axis_names=... (got {n_devices!r})"
            ) from None
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf of a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), tree)


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf's leading (batch) dimension over a mesh axis."""

    def shard(leaf):
        ndim = jax.numpy.ndim(leaf)
        spec = P(axis, *([None] * (ndim - 1))) if ndim else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(shard, tree)


def shard_params(
    tree: Any,
    mesh: Mesh,
    axis: str = "model",
    min_size: int = 1024,
    report: dict | None = None,
    verbose: bool = False,
) -> Any:
    """Shard large parameter matrices over a model axis (tensor-parallel style).

    For each 2D+ leaf the LARGEST dimension that is divisible by the axis
    size and at least ``min_size`` is sharded (the trailing dim wins ties —
    output-dim sharding lets XLA keep the matmul result sharded); leaves
    with no eligible dimension are replicated. XLA inserts the
    all-gathers/reduce-scatters where the jitted curvature kernels need
    them. Picking the largest dim rather than only the trailing one means
    e.g. a ``[vocab, d]`` embedding with an odd vocab still shards on
    ``vocab``-divisible meshes or falls back to the hidden dim instead of
    silently replicating its hundreds of MB.

    Args:
        tree: Parameter pytree.
        mesh: Device mesh.
        axis: Mesh axis to shard over.
        min_size: Minimum dimension size to shard.
        report: Optional dict, filled with ``{"sharded": [(path, shape,
            dim)], "replicated": [(path, shape, reason)]}`` so callers can
            see exactly what the heuristic did (nothing is ever silently
            replicated without a recorded reason).
        verbose: Print a one-line summary of the placement.

    Returns:
        The placed pytree.
    """
    axis_size = mesh.shape[axis]
    sharded: list = []
    replicated: list = []

    def place(path, leaf):
        shape = jax.numpy.shape(leaf)
        name = jax.tree_util.keystr(path)
        if len(shape) < 2:
            replicated.append((name, shape, "fewer than 2 dims"))
        else:
            eligible = [
                d for d, s in enumerate(shape)
                if s % axis_size == 0 and s >= min_size
            ]
            if not eligible:
                replicated.append(
                    (name, shape,
                     f"no dim divisible by {axis_size} and >= "
                     f"min_size={min_size}")
                )
            else:
                # largest dim; trailing wins ties (reversed scan order)
                dim = max(reversed(eligible), key=lambda d: shape[d])
                sharded.append((name, shape, dim))
                spec = P(*(axis if d == dim else None
                           for d in range(len(shape))))
                return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    out = jax.tree_util.tree_map_with_path(place, tree)
    if report is not None:
        report["sharded"] = sharded
        report["replicated"] = replicated
    if verbose:
        n_sh = sum(int(np.prod(s)) for _, s, _ in sharded)
        n_rep = sum(int(np.prod(s)) for _, s, _ in replicated)
        print(
            f"shard_params: {len(sharded)} leaves sharded over '{axis}' "
            f"({n_sh:,} params), {len(replicated)} replicated "
            f"({n_rep:,} params)"
        )
        for name, shape, reason in replicated:
            if np.prod(shape) >= min_size:
                print(f"  replicated {name} {shape}: {reason}")
    return out
