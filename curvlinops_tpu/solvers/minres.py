"""Batched MINRES for symmetric INDEFINITE systems, fully on device.

Beyond the reference (whose inverse layer offers CG — SPD only — LSMR, and
Neumann): deep-learning Hessians are indefinite, so ``H x = b`` solves (e.g.
Newton steps, influence functions on the damped Hessian) need a Krylov
method that does not require positive definiteness. MINRES (Paige &
Saunders 1975) minimizes ``||b - A x||`` over the Krylov space of a
symmetric ``A`` with three-term recurrences — the same
all-columns-at-once ``lax.while_loop`` structure as
:mod:`curvlinops_tpu.solvers.cg`: per-column Givens scalars ``[K]``, one
XLA program for all K right-hand sides, no host round trips.

Implementation follows the standard Lanczos + Givens-QR formulation
(Paige & Saunders 1975; Greenbaum 1997 Alg. 2.1 layout). The residual norm
is tracked by the exact recurrence ``|s_{j+1}| * ||r_j||``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.solvers.cg import _axpy, _col_dot


def batched_minres(
    matvec: Callable[[Any], Any],
    B: Any,
    *,
    x0: Any = None,
    maxiter: int = 100,
    tol: float = 1e-5,
    atol: float = 1e-8,
) -> tuple[Any, dict]:
    """Solve symmetric (possibly indefinite) ``A X = B`` column-wise.

    Args:
        matvec: Traceable symmetric linear map on column-pytrees.
        B: Right-hand sides as a pytree with a trailing column axis.
        x0: Initial guess (zeros if ``None``).
        maxiter: Iteration cap.
        tol: Relative residual tolerance (per column, vs ``||b||``).
        atol: Absolute residual tolerance floor.

    Returns:
        ``(X, info)`` where ``info`` has the global iteration count
        (``iterations``), the per-column active-iteration counts
        (``column_iterations`` [K]), and the per-column final residual-norm
        estimates (``residuals``).
    """
    eps = jnp.finfo(jax.tree.leaves(B)[0].dtype).eps
    X0 = x0 if x0 is not None else jax.tree.map(jnp.zeros_like, B)
    R0 = jax.tree.map(lambda b, ax: b - ax, B, matvec(X0))

    normb = jnp.sqrt(_col_dot(B, B))
    threshold = jnp.maximum(tol * normb, atol)

    beta1 = jnp.sqrt(_col_dot(R0, R0))
    safe_b1 = jnp.where(beta1 <= eps, 1.0, beta1)
    V = jax.tree.map(lambda r: r / safe_b1, R0)  # v_1
    V_prev = jax.tree.map(jnp.zeros_like, B)  # v_0
    W = jax.tree.map(jnp.zeros_like, B)  # w_0
    W_prev = jax.tree.map(jnp.zeros_like, B)  # w_{-1}

    K = beta1.shape[0] if beta1.ndim else 1
    ones = jnp.ones_like(beta1)
    zeros = jnp.zeros_like(beta1)

    # Givens state: c/s of the last two rotations
    state = (
        X0, V, V_prev, W, W_prev,
        beta1,  # beta_j (subdiagonal entering step j)
        ones, zeros,  # c_j, s_j        (rotation j-1; identity initially)
        ones, zeros,  # c_old, s_old    (rotation j-2)
        beta1,  # eta_j (projected rhs component)
        beta1,  # residual-norm estimate ||r_{j-1}||
        jnp.asarray(0),
        jnp.zeros_like(beta1, dtype=jnp.int32),  # per-column active counts
    )

    def cond(st):
        res, k = st[11], st[12]
        return jnp.logical_and(
            k < maxiter, jnp.logical_not(jnp.all(res <= threshold))
        )

    def body(st):
        (X, V, V_prev, W, W_prev, beta, c, s, c_old, s_old, eta, res, k,
         col_iters) = st
        active = res > threshold

        # Lanczos step
        P = matvec(V)
        alpha = _col_dot(V, P)
        P = jax.tree.map(
            lambda p, v, vp: p - alpha * v - beta * vp, P, V, V_prev
        )
        beta_new = jnp.sqrt(jnp.maximum(_col_dot(P, P), 0.0))
        safe_bn = jnp.where(beta_new <= eps, 1.0, beta_new)
        V_new = jax.tree.map(lambda p: p / safe_bn, P)

        # apply the two previous Givens rotations to the new column
        # [ beta_j ; alpha_j ; beta_{j+1} ] of the tridiagonal
        delta = c * alpha - c_old * s * beta
        rho2 = s * alpha + c_old * c * beta
        rho3 = s_old * beta
        rho1 = jnp.sqrt(delta**2 + beta_new**2)
        safe_r1 = jnp.where(rho1 <= eps, 1.0, rho1)
        c_new = delta / safe_r1
        s_new = beta_new / safe_r1

        # direction update and solution step
        W_new = jax.tree.map(
            lambda v, w, wp: (v - rho2 * w - rho3 * wp) / safe_r1, V, W, W_prev
        )
        step = jnp.where(active, c_new * eta, 0.0)
        X = _axpy(step, W_new, X)

        eta_new = -s_new * eta
        res_new = jnp.where(active, jnp.abs(eta_new), res)
        return (
            X, V_new, V, W_new, W,
            jnp.where(active, beta_new, beta),
            jnp.where(active, c_new, c), jnp.where(active, s_new, s),
            jnp.where(active, c, c_old), jnp.where(active, s, s_old),
            jnp.where(active, eta_new, eta),
            res_new, k + 1, col_iters + active,
        )

    final = jax.lax.while_loop(cond, body, state)
    info = {
        "iterations": final[12],
        "column_iterations": final[13],
        "residuals": final[11],
    }
    return final[0], info
