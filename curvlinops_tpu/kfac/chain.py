"""Single-dispatch application of KFAC-family chains ``P @ blockdiag @ P^T``.

The generic :class:`ChainLinearOperator` applies canonical converters and each
Kronecker/eigendecomposed block as separate host-level calls (and, if a user
wraps it in ``jax.jit``, the factor matrices become captured HLO constants —
2 GiB for a 124M-parameter GPT). This subclass keeps the introspectable chain
structure but routes ``_matmat`` through ONE jitted pure function whose factor
matrices are runtime ARGUMENTS: a KFAC matvec is a single dispatch, and the
compiled program is factor-free.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from curvlinops_tpu.ops.base import ChainLinearOperator, PytreeLinearOperator
from curvlinops_tpu.ops.blockdiag import BlockDiagonalLinearOperator
from curvlinops_tpu.ops.eigh import EighDecomposedLinearOperator
from curvlinops_tpu.ops.kronecker import KroneckerProductLinearOperator, kron_matmat
from curvlinops_tpu.ops.stacked import stacked_kron_matmat
from curvlinops_tpu.utils.flatten import spec_of


@functools.lru_cache(maxsize=None)
def _sharded_eigh_fn(in_sharding, out_sharding, n: int):
    # one PjitFunction per (sharding, n): a fresh jax.jit wrapper on every
    # call would re-trace (and re-submit remote compiles) for shapes it has
    # already seen. The pad-dropping slice and the gather to replicated
    # happen INSIDE the program: an eager `w[:n]` on the sharded result
    # crosses shard boundaries and measured as slow as the
    # eigendecomposition itself (20-45 s per shape on the 124M-GPT profile,
    # `benchmarks/mesh_eigh_measured.py`), while the compiled slice+gather
    # is bytes-over-interconnect.
    def eigh_slice(stacked):
        w, v = jnp.linalg.eigh(stacked)
        return w[:n], v[:n]

    return jax.jit(
        eigh_slice, in_shardings=in_sharding, out_shardings=out_sharding
    )


def _mesh_sharded_eigh(stacked: jax.Array, mesh, data_axis: str):
    """Eigh a ``[n, D, D]`` stack sharded over a mesh axis (pad + shard).

    The per-matrix decompositions are independent, so sharding the stack
    axis runs them concurrently across devices — the multi-chip answer to
    eigh dominating exact-damped inversion / EKFAC builds.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n, D = stacked.shape[0], stacked.shape[1]
    n_dev = mesh.shape[data_axis]
    pad = (-n) % n_dev
    if pad:
        eye = jnp.broadcast_to(jnp.eye(D, dtype=stacked.dtype), (pad, D, D))
        stacked = jnp.concatenate([stacked, eye])
    sharding = NamedSharding(mesh, PartitionSpec(data_axis))
    replicated = NamedSharding(mesh, PartitionSpec())
    stacked = jax.device_put(stacked, sharding)
    # replicated output: downstream consumers (Kronecker chains, EKFAC
    # bases, the per-key split below) read the factors whole; leaving the
    # result sharded turns every later eager slice into a cross-shard
    # reshard (the measured 2x of mesh_eigh_measured.py)
    return _sharded_eigh_fn(sharding, replicated, n)(stacked)


@jax.jit
def _batched_eigh_program(mats: dict) -> dict:
    """Whole-build jit of :func:`batched_eigh` (no-mesh path).

    Eager per-shape dispatches cost a tunnel round trip EACH on remote
    runtimes: the same build measured ~0.17 s as one program and 8+ s
    eagerly (A/B in ``benchmarks/profile_rank_phases.py``).  The mesh
    variant stays eager (it places shards with ``device_put``).
    """
    return batched_eigh(mats)


def batched_eigh(mats: dict, mesh=None, data_axis: str = "data") -> dict:
    """Eigendecompose a dict of symmetric matrices, batching equal shapes.

    A transformer's KFAC factors repeat the same few shapes across layers
    (e.g. 12x ``3072^2``); one vmapped ``eigh`` per shape replaces dozens of
    sequential dispatches — the dominant cost of exact-damped inversion and
    EKFAC builds on TPU. Values may themselves carry leading stack axes
    (scan-stacked factors ``[L, D, D]``); with ``mesh`` given, each shape
    batch is sharded over the mesh's ``data_axis`` so the independent
    decompositions run concurrently across devices.

    Returns:
        ``{key: (eigenvalues, eigenvectors)}``.
    """
    by_shape: dict = {}
    for k, m in mats.items():
        by_shape.setdefault(m.shape, []).append(k)
    out = {}
    for shape, keys in by_shape.items():
        if mesh is not None:
            D = shape[-1]
            flat = jnp.concatenate(
                [mats[k].reshape(-1, D, D) for k in keys]
            )
            w, v = _mesh_sharded_eigh(flat, mesh, data_axis)
            lead = 0
            for k in keys:
                cnt = int(np.prod(mats[k].shape[:-2], dtype=np.int64)) or 1
                wk = w[lead : lead + cnt].reshape(*mats[k].shape[:-2], D)
                vk = v[lead : lead + cnt].reshape(mats[k].shape)
                out[k] = (wk, vk)
                lead += cnt
            continue
        if len(keys) == 1:
            out[keys[0]] = jnp.linalg.eigh(mats[keys[0]])
            continue
        w, v = jnp.linalg.eigh(jnp.stack([mats[k] for k in keys]))
        for i, k in enumerate(keys):
            out[k] = (w[i], v[i])
    return out


def _kron_matmat_T(factors: list[jax.Array], M: jax.Array) -> jax.Array:
    return kron_matmat([S.T for S in factors], M)


def _stacked_kron_matmat_T(factors: list[jax.Array], M: jax.Array) -> jax.Array:
    return stacked_kron_matmat([jnp.swapaxes(S, -1, -2) for S in factors], M)


# NOTE a zero-padded batched apply for chains of many small blocks (pad
# every square factor to the group max, collapse the block-diagonal apply
# into 2-4 batched dot_generals) was tried in round 3 and REMOVED in round
# 4: the valid loop-timed A/B (``benchmarks/micro_hetero_stack.py``,
# ``results/micro_hetero_stack.json``) measures the per-block apply at
# 0.033 ms vs 0.150 ms padded on the mnist-MLP chain — inside one jitted
# program there is no per-op dispatch overhead to amortize (the motivating
# 0.76 ms "per-block" number was tunnel dispatch, not compute), so the
# padding's ~5x extra FLOPs are a pure loss at any chain size.


def _batched_damped_cholesky_inverse(
    A: jax.Array, damping: jax.Array, retry_double_precision: bool = True
) -> jax.Array:
    """Invert ``A[l] + damping[l] I`` for a factor stack ``[L, D, D]``.

    Mirrors :func:`curvlinops_tpu.ops.kronecker.damped_cholesky_inverse`
    (fp64 NaN-retry) but stays batched over the stack.

    Raises:
        RuntimeError: If the factorization fails even in double precision (or
            the retry is disabled).
    """
    n = A.shape[-1]

    def _inv(mat, d):
        eye = jnp.eye(n, dtype=mat.dtype)
        damped = mat + d[:, None, None] * eye
        Lc = jnp.linalg.cholesky(damped)
        inv = jax.vmap(lambda c: jax.scipy.linalg.cho_solve((c, True), eye))(Lc)
        return inv, Lc

    inv, Lc = _inv(A, jnp.asarray(damping, A.dtype))
    if not bool(jnp.isnan(Lc).any()):
        return inv
    if not retry_double_precision or A.dtype == jnp.float64:
        raise RuntimeError(
            "Cholesky decomposition failed (NaNs in the factor) and double-"
            "precision retry is disabled."
        )
    import warnings

    warnings.warn(
        f"Cholesky failed in {A.dtype}; retrying in float64.", stacklevel=2
    )
    with jax.enable_x64(True):
        inv64, Lc64 = _inv(
            jnp.asarray(A, jnp.float64), jnp.asarray(damping, jnp.float64)
        )
        if bool(jnp.isnan(Lc64).any()):
            raise RuntimeError("Cholesky decomposition failed in float64.")
        return jnp.asarray(inv64, A.dtype)


def stacked_kron_inverse(
    factors: list[jax.Array],
    damping: float,
    use_heuristic_damping: bool,
    min_damping: float,
    retry_double_precision: bool,
) -> list[jax.Array]:
    """Damped inverse of a stack of Kronecker blocks, batched over the stack.

    Plain and Martens-Grosse heuristic damping semantics match
    ``ops/kronecker.py`` (``kronecker.py:303-373``), with the per-block
    ``pi = sqrt(mean-eig ratio)`` computed per stack slice.

    Raises:
        ValueError: For heuristic damping with more than two factors.
        RuntimeError: On a negative mean eigenvalue under heuristic damping.
    """
    import math as _math

    L = factors[0].shape[0]
    if use_heuristic_damping and len(factors) > 2:
        raise ValueError(
            "Heuristic damping supports at most two factors, got "
            f"{len(factors)}."
        )
    if use_heuristic_damping and len(factors) == 2:
        S1, S2 = factors
        m1 = jnp.mean(jnp.diagonal(S1, axis1=-2, axis2=-1), axis=-1)
        m2 = jnp.mean(jnp.diagonal(S2, axis1=-2, axis2=-1), axis=-1)
        if bool(jnp.any(m1 < 0)) or bool(jnp.any(m2 < 0)):
            raise RuntimeError("Negative mean eigenvalue detected.")
        pi = jnp.sqrt(m2 / m1)
        sqrt_damping = _math.sqrt(damping)
        dampings = (
            jnp.maximum(sqrt_damping / pi, min_damping),
            jnp.maximum(sqrt_damping * pi, min_damping),
        )
    elif use_heuristic_damping:
        dampings = (jnp.full((L,), max(damping, min_damping)),)
    else:
        dampings = tuple(jnp.full((L,), damping) for _ in factors)

    return [
        _batched_damped_cholesky_inverse(S, d, retry_double_precision)
        for S, d in zip(factors, dampings)
    ]


@functools.partial(
    jax.jit, static_argnames=("struct", "use_heuristic")
)
def _grouped_kron_inverse_program(
    factors: dict, damping, min_damping, *, struct, use_heuristic: bool
):
    """Damped-invert every plain/heuristic Kronecker factor in ONE program.

    ``factors`` maps ``(gi, fi) -> factor`` (values may carry leading stack
    axes); ``struct`` is a hashable ``((gi, n_factors), ...)``. Equal factor
    shapes share one batched Cholesky (a transformer repeats the same few
    sizes across layers). Returns ``(inv, flags)`` where ``flags[0]`` is
    "some Cholesky produced NaN" and ``flags[1]`` is "heuristic damping met
    a negative mean eigenvalue" — the caller reads the two-bool array ONCE,
    where the per-block path pays 2-4 host readbacks per block (measured
    7.8 s of pure tunnel latency for a ms-scale compute on the 124M GPT).
    """
    damps: dict = {}
    neg = jnp.zeros((), jnp.bool_)
    sqrtd = jnp.sqrt(jnp.asarray(damping))
    for gi, nf in struct:
        if use_heuristic and nf == 2:
            # Martens-Grosse pi-split (kronecker.py:303-373 semantics)
            S1, S2 = factors[(gi, 0)], factors[(gi, 1)]
            m1 = jnp.mean(jnp.diagonal(S1, axis1=-2, axis2=-1), axis=-1)
            m2 = jnp.mean(jnp.diagonal(S2, axis1=-2, axis2=-1), axis=-1)
            neg = neg | jnp.any(m1 < 0) | jnp.any(m2 < 0)
            # zero factor trace -> no scale information -> plain split
            # (pi = 1); matches ops/kronecker.py — MC-Fisher ggT factors
            # underflow to exact zero on saturated-softmax models
            pi = jnp.where(
                (m1 > 0) & (m2 > 0), jnp.sqrt(m2 / jnp.where(m1 > 0, m1, 1.0)), 1.0
            )
            damps[(gi, 0)] = jnp.maximum(sqrtd / pi, min_damping)
            damps[(gi, 1)] = jnp.maximum(sqrtd * pi, min_damping)
        else:
            d = (
                jnp.maximum(jnp.asarray(damping), min_damping)
                if use_heuristic
                else jnp.asarray(damping)
            )
            for fi in range(nf):
                damps[(gi, fi)] = d
    by_shape: dict = {}
    for key in sorted(factors):
        S = factors[key]
        by_shape.setdefault((S.shape[-1], str(S.dtype)), []).append(key)
    inv_out: dict = {}
    nan = jnp.zeros((), jnp.bool_)
    for (D, _), keys in sorted(by_shape.items()):
        counts = [
            int(np.prod(factors[k].shape[:-2], dtype=np.int64)) or 1
            for k in keys
        ]
        A = jnp.concatenate(
            [factors[k].reshape(-1, D, D) for k in keys]
        )
        dvec = jnp.concatenate(
            [
                jnp.broadcast_to(damps[k], (cnt,)).reshape(-1)
                for k, cnt in zip(keys, counts)
            ]
        )
        eye = jnp.eye(D, dtype=A.dtype)
        damped = A + dvec[:, None, None].astype(A.dtype) * eye
        Lc = jnp.linalg.cholesky(damped)
        solve = lambda c: jax.scipy.linalg.cho_solve((c, True), eye)
        if D >= 1024:
            # XLA's batched triangular solve materializes several
            # [n, D, D]-scale HLO temps — vmap over the GPT's 36 stacked
            # [3072, 3072] factors needed 16.3 GiB and OOM'd one chip.
            # lax.map runs the solves sequentially inside the SAME program
            # (one [D, D] temp set at a time); the solves are ms-scale on
            # the MXU, so sequencing costs nothing measurable.
            inv = jax.lax.map(solve, Lc)
        else:
            inv = jax.vmap(solve)(Lc)
        nan = nan | jnp.isnan(Lc).any()
        lead = 0
        for k, cnt in zip(keys, counts):
            inv_out[k] = inv[lead : lead + cnt].reshape(factors[k].shape)
            lead += cnt
    return inv_out, jnp.stack([nan, neg])


def grouped_kron_inverse(
    blocks: dict,
    damping: float,
    use_heuristic_damping: bool,
    min_damping: float,
) -> dict | None:
    """Batched plain/heuristic damped inversion of ``kron``/``skron`` blocks.

    One jitted program + ONE two-flag readback for the whole model (the
    per-block path's eager means/NaN checks cost 2-4 tunnel round trips per
    block — the dominant cost of a Cholesky build through the remote TPU).

    Returns ``{gi: [inverted factors...]}``, or ``None`` when some factor's
    Cholesky produced NaN — the caller then falls back to the per-block
    path, which retries the failing factors in float64.

    Raises:
        ValueError: Heuristic damping with more than two factors (matching
            ``ops/kronecker.py``).
        RuntimeError: Heuristic damping met a negative mean eigenvalue.
    """
    if not blocks:
        return {}
    if use_heuristic_damping and any(
        len(f) > 2 for _, f in blocks.values()
    ):
        raise ValueError(
            "Heuristic damping supports at most two factors."
        )
    struct = tuple(
        sorted((gi, len(fs)) for gi, (_, fs) in blocks.items())
    )
    factors = {
        (gi, fi): S
        for gi, (_, fs) in blocks.items()
        for fi, S in enumerate(fs)
    }
    inv, flags = _grouped_kron_inverse_program(
        factors,
        damping,
        min_damping,
        struct=struct,
        use_heuristic=use_heuristic_damping,
    )
    flags = np.asarray(flags)  # the single host readback
    if flags[1]:
        raise RuntimeError("Negative mean eigenvalue detected.")
    if flags[0]:
        return None
    return {
        gi: [inv[(gi, fi)] for fi in range(len(fs))]
        for gi, (_, fs) in blocks.items()
    }


class KroneckerChainOperator(ChainLinearOperator):
    """``FromCanonical @ blockdiag(blocks) @ ToCanonical`` with jitted apply.

    ``blocks_data[gi]`` is one of

    - ``("kron", [factors...])`` — a Kronecker block,
    - ``("eigh", (eigenvalues, [Q factors...]))`` — an eigendecomposed block,
    - ``("skron", [stacked factors...])`` — ``L`` Kronecker blocks batched
      over a leading stack axis (scan-stacked layers),
    - ``("seigh", (eigenvalues [L, D], [stacked Q factors...]))`` — the
      eigendecomposed stacked variant.
    """

    SELF_ADJOINT = True

    def __init__(
        self,
        params: Any,
        blocks_data: dict,
        to_canonical: Callable,
        from_canonical: Callable,
    ):
        # introspectable chain (todense/algebra/etc. still work through it);
        # stacked blocks unroll into per-slice operators here, but the hot
        # _matmat path below stays batched
        blocks = []
        for gi in sorted(blocks_data):
            kind, data = blocks_data[gi]
            if kind == "kron":
                blocks.append(KroneckerProductLinearOperator(*data))
            elif kind == "eigh":
                lam, Q_factors = data
                blocks.append(
                    EighDecomposedLinearOperator(
                        lam.reshape(-1), KroneckerProductLinearOperator(*Q_factors)
                    )
                )
            elif kind == "skron":
                from curvlinops_tpu.ops.stacked import StackedKroneckerOperator

                blocks.append(StackedKroneckerOperator(*data))
            elif kind == "seigh":
                from curvlinops_tpu.ops.stacked import StackedEighOperator

                lam, Q_factors = data
                blocks.append(StackedEighOperator(lam, Q_factors))
            elif kind == "krond":
                from curvlinops_tpu.ops.kronecker import EmbeddingKroneckerOperator

                blocks.append(EmbeddingKroneckerOperator(*data))
            elif kind == "eighd":
                from curvlinops_tpu.ops.kronecker import EmbeddingEighOperator

                lam, Q = data
                blocks.append(EmbeddingEighOperator(lam, Q))
            elif kind == "lreigh":
                from curvlinops_tpu.kfac.randomized import (
                    LowRankDampedInverseOperator,
                )

                blocks.append(LowRankDampedInverseOperator(data))
            elif kind == "slreigh":
                from curvlinops_tpu.kfac.randomized import (
                    StackedLowRankDampedInverseOperator,
                )

                blocks.append(StackedLowRankDampedInverseOperator(data))
            else:
                raise ValueError(f"Unknown block kind {kind!r}.")
        K = BlockDiagonalLinearOperator(blocks)
        param_spec = spec_of(params)
        canonical_spec = jax.eval_shape(to_canonical, param_spec)
        PT = PytreeLinearOperator(to_canonical, param_spec, canonical_spec)
        P = PT.adjoint()
        super().__init__([P, K, PT])

        self._blocks_data = blocks_data
        self._to_canonical = to_canonical
        self._from_canonical = from_canonical
        self._jit_apply = None

    def _matmat(self, M: Any) -> Any:
        if self._jit_apply is None:
            to_c, from_c = self._to_canonical, self._from_canonical
            kinds = {gi: kind for gi, (kind, _) in self._blocks_data.items()}

            @jax.jit
            def apply(block_arrays: dict, M: Any) -> Any:
                cols = jax.vmap(to_c, in_axes=-1, out_axes=-1)(M)
                # compute in the canonical input dtype: factors are STORED
                # in f32 (the build/accumulation dtype), but a bf16 operand
                # must get bf16 MXU matmuls and a bf16 result — f32-promoted
                # outputs broke dtype-stable loop embedding and silently ran
                # the speed mode's matvecs in f32 (cast fuses, costs nothing)
                dt = jax.tree.leaves(cols)[0].dtype
                block_arrays = jax.tree.map(
                    lambda a: a.astype(dt)
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a,
                    block_arrays,
                )
                out = []
                for bi, gi in enumerate(sorted(kinds)):
                    comp = cols[bi]  # [block_size, K]
                    if kinds[gi] == "kron":
                        out.append(kron_matmat(block_arrays[gi], comp))
                    elif kinds[gi] == "skron":
                        out.append(stacked_kron_matmat(block_arrays[gi], comp))
                    elif kinds[gi] == "seigh":
                        lam, Qs = block_arrays[gi]
                        W = _stacked_kron_matmat_T(Qs, comp)
                        W = lam.reshape(-1)[:, None] * W
                        out.append(stacked_kron_matmat(Qs, W))
                    elif kinds[gi] == "krond":
                        G, d = block_arrays[gi]
                        K = comp.shape[-1]
                        X = comp.reshape(G.shape[1], d.shape[0], K)
                        o = jnp.einsum("ab,bvk->avk", G, X) * d[None, :, None]
                        out.append(o.reshape(-1, K))
                    elif kinds[gi] == "lreigh":
                        from curvlinops_tpu.kfac.randomized import lr_apply

                        out.append(lr_apply(block_arrays[gi], comp))
                    elif kinds[gi] == "slreigh":
                        from curvlinops_tpu.kfac.randomized import (
                            lr_apply_stacked,
                        )

                        out.append(lr_apply_stacked(block_arrays[gi], comp))
                    elif kinds[gi] == "eighd":
                        lam, Q = block_arrays[gi]
                        K = comp.shape[-1]
                        X = comp.reshape(*lam.shape, K)
                        W = jnp.einsum("ba,bvk->avk", Q, X) * lam[:, :, None]
                        o = jnp.einsum("ab,bvk->avk", Q, W)
                        out.append(o.reshape(-1, K))
                    else:
                        lam, Qs = block_arrays[gi]
                        W = _kron_matmat_T(Qs, comp)
                        W = lam.reshape(-1)[:, None] * W
                        out.append(kron_matmat(Qs, W))
                return jax.vmap(from_c, in_axes=-1, out_axes=-1)(tuple(out))

            self._jit_apply = apply
        arrays = {gi: data for gi, (_, data) in self._blocks_data.items()}
        return self._jit_apply(arrays, M)
