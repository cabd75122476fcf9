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

from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import ChainLinearOperator, PytreeLinearOperator
from curvlinops_tpu.ops.blockdiag import BlockDiagonalLinearOperator
from curvlinops_tpu.ops.eigh import EighDecomposedLinearOperator
from curvlinops_tpu.ops.kronecker import KroneckerProductLinearOperator
from curvlinops_tpu.utils.flatten import spec_of


def batched_eigh(mats: dict) -> dict:
    """Eigendecompose a dict of symmetric matrices, batching equal shapes.

    A transformer's KFAC factors repeat the same few shapes across layers
    (e.g. 12x ``3072^2``); one vmapped ``eigh`` per shape replaces dozens of
    sequential dispatches — the dominant cost of exact-damped inversion and
    EKFAC builds on TPU.

    Returns:
        ``{key: (eigenvalues, eigenvectors)}``.
    """
    by_shape: dict = {}
    for k, m in mats.items():
        by_shape.setdefault(m.shape, []).append(k)
    out = {}
    for shape, keys in by_shape.items():
        if len(keys) == 1:
            out[keys[0]] = jnp.linalg.eigh(mats[keys[0]])
            continue
        w, v = jnp.linalg.eigh(jnp.stack([mats[k] for k in keys]))
        for i, k in enumerate(keys):
            out[k] = (w[i], v[i])
    return out


def _kron_matmat(factors: list[jax.Array], M: jax.Array) -> jax.Array:
    """Kronecker-product matmat via per-axis contractions (``ops/kronecker.py``)."""
    K = M.shape[-1]
    grid = tuple(S.shape[1] for S in factors)
    x = M.reshape(*grid, K)
    for i, S in enumerate(factors):
        x = jnp.moveaxis(jnp.tensordot(S, x, axes=[[1], [i]]), 0, i)
    return x.reshape(-1, K)


def _kron_matmat_T(factors: list[jax.Array], M: jax.Array) -> jax.Array:
    return _kron_matmat([S.T for S in factors], M)


class KroneckerChainOperator(ChainLinearOperator):
    """``FromCanonical @ blockdiag(blocks) @ ToCanonical`` with jitted apply.

    ``blocks_data[gi]`` is either ``("kron", [factors...])`` or
    ``("eigh", (eigenvalues, [Q factors...]))``.
    """

    SELF_ADJOINT = True

    def __init__(
        self,
        params: Any,
        blocks_data: dict,
        to_canonical: Callable,
        from_canonical: Callable,
    ):
        # introspectable chain (todense/algebra/etc. still work through it)
        blocks = []
        for gi in sorted(blocks_data):
            kind, data = blocks_data[gi]
            if kind == "kron":
                blocks.append(KroneckerProductLinearOperator(*data))
            else:
                lam, Q_factors = data
                blocks.append(
                    EighDecomposedLinearOperator(
                        lam.reshape(-1), KroneckerProductLinearOperator(*Q_factors)
                    )
                )
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
                out = []
                for bi, gi in enumerate(sorted(kinds)):
                    comp = cols[bi]  # [block_size, K]
                    if kinds[gi] == "kron":
                        out.append(_kron_matmat(block_arrays[gi], comp))
                    else:
                        lam, Qs = block_arrays[gi]
                        W = _kron_matmat_T(Qs, comp)
                        W = lam.reshape(-1)[:, None] * W
                        out.append(_kron_matmat(Qs, W))
                return jax.vmap(from_c, in_axes=-1, out_axes=-1)(tuple(out))

            self._jit_apply = apply
        arrays = {gi: data for gi, (_, data) in self._blocks_data.items()}
        return self._jit_apply(arrays, M)
