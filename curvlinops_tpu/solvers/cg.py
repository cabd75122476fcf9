"""Batched preconditioned conjugate gradients, fully on device.

TPU-native replacement for the reference's GPyTorch-CG dependency
(``curvlinops/inverse.py:54-140``): a ``lax.while_loop`` PCG over a pytree of
right-hand sides with a trailing column axis. Every column carries its own
alpha/beta scalars, so one XLA program solves all K systems simultaneously —
no host round trips, no per-column Python loops. Converged columns freeze
(their alpha is masked to zero) while the rest keep iterating.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _col_dot(a: Any, b: Any) -> jax.Array:
    """Per-column inner products of two column-pytrees -> ``[K]``."""
    parts = [
        jnp.einsum("...k,...k->k", x, y)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    ]
    return sum(parts[1:], parts[0])


def _axpy(alpha: jax.Array, x: Any, y: Any) -> Any:
    """``y + alpha * x`` with per-column ``alpha [K]``."""
    return jax.tree.map(lambda xl, yl: yl + alpha * xl, x, y)


def batched_cg(
    matvec: Callable[[Any], Any],
    B: Any,
    *,
    x0: Any = None,
    maxiter: int = 100,
    tol: float = 1e-5,
    atol: float = 1e-8,
    preconditioner: Callable[[Any], Any] | None = None,
) -> tuple[Any, dict]:
    """Solve ``A X = B`` column-wise with PCG inside one ``lax.while_loop``.

    Args:
        matvec: Traceable linear map on column-pytrees (applies A to all K
            columns at once).
        B: Right-hand sides as a pytree with a trailing column axis.
        x0: Initial guess (zeros if ``None``).
        maxiter: Iteration cap.
        tol: Relative residual tolerance (per column, vs ``||b||``).
        atol: Absolute residual tolerance floor.
        preconditioner: Traceable approximate inverse of A.

    Returns:
        ``(X, info)`` where ``info`` has the global iteration count
        (``iterations``: until EVERY column converged or the cap), the
        per-column active-iteration counts (``column_iterations`` [K]),
        and the per-column final residual norms.
    """
    M = preconditioner or (lambda r: r)
    X0 = x0 if x0 is not None else jax.tree.map(jnp.zeros_like, B)

    normb = jnp.sqrt(_col_dot(B, B))
    threshold = jnp.maximum(tol * normb, atol)

    R0 = jax.tree.map(lambda b, ax: b - ax, B, matvec(X0))
    Z0 = M(R0)
    P0 = Z0
    rz0 = _col_dot(R0, Z0)

    def cond(state):
        _, R, _, _, _, k, _ = state
        resid = jnp.sqrt(_col_dot(R, R))
        return jnp.logical_and(k < maxiter, jnp.any(resid > threshold))

    def body(state):
        X, R, Z, P, rz, k, col_iters = state
        resid = jnp.sqrt(_col_dot(R, R))
        active = resid > threshold
        AP = matvec(P)
        pAp = _col_dot(P, AP)
        alpha = jnp.where(active, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        X = _axpy(alpha, P, X)
        R = _axpy(-alpha, AP, R)
        Z = M(R)
        rz_new = _col_dot(R, Z)
        beta = jnp.where(active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        P = _axpy(beta, P, Z)
        return X, R, Z, P, rz_new, k + 1, col_iters + active

    col_iters0 = jnp.zeros_like(normb, dtype=jnp.int32)
    X, R, _, _, _, iters, col_iters = jax.lax.while_loop(
        cond, body, (X0, R0, Z0, P0, rz0, jnp.asarray(0), col_iters0)
    )
    info = {
        "iterations": iters,  # global: until EVERY column converged / cap
        "column_iterations": col_iters,  # [K] per-column active counts
        "residual_norms": jnp.sqrt(_col_dot(R, R)),
    }
    return X, info
