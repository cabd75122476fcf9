"""Batched on-device LSMR (Fong & Saunders 2011) for least-squares inverses.

TPU-native replacement for the reference's host escape to
``scipy.sparse.linalg.lsmr`` per column (``curvlinops/inverse.py:143-211``):
the Golub-Kahan recurrences are elementwise in the per-column scalars, so all
K right-hand sides run simultaneously inside one ``lax.while_loop`` — data
never leaves the device. Implemented from the published LSMR algorithm
(arXiv:1006.0758); stopping follows the standard normr/normar criteria.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.solvers.cg import _axpy, _col_dot


def _col_norm(a: Any) -> jax.Array:
    return jnp.sqrt(_col_dot(a, a))


def _scale(s: jax.Array, a: Any) -> Any:
    return jax.tree.map(lambda leaf: s * leaf, a)


def batched_lsmr(
    matvec: Callable[[Any], Any],
    rmatvec: Callable[[Any], Any],
    B: Any,
    *,
    damp: float = 0.0,
    maxiter: int = 100,
    atol: float = 1e-6,
    btol: float = 1e-6,
) -> tuple[Any, dict]:
    """Solve ``min ||A X - B||`` (+ Tikhonov ``damp``) for all columns at once.

    Args:
        matvec: Applies ``A`` to a column-pytree of the input space.
        rmatvec: Applies ``A^T`` to a column-pytree of the output space.
        B: Right-hand sides (output-space pytree with trailing column axis).
        damp: Tikhonov damping.
        maxiter: Iteration cap.
        atol / btol: Standard LSMR tolerances.

    Returns:
        ``(X, info)`` with per-column ``iterations``, ``normr`` (residual) and
        ``normar`` (normal-equations residual) estimates.
    """
    eps = jnp.finfo(jax.tree.leaves(B)[0].dtype).eps

    beta = _col_norm(B)
    safe_beta = jnp.where(beta == 0, 1.0, beta)
    u = _scale(1.0 / safe_beta, B)
    v_raw = rmatvec(u)
    alpha = _col_norm(v_raw)
    safe_alpha = jnp.where(alpha == 0, 1.0, alpha)
    v = _scale(1.0 / safe_alpha, v_raw)

    X = jax.tree.map(jnp.zeros_like, v)
    h, hbar = v, jax.tree.map(jnp.zeros_like, v)

    zetabar = alpha * beta
    alphabar = alpha
    rho = jnp.ones_like(beta)
    rhobar = jnp.ones_like(beta)
    cbar = jnp.ones_like(beta)
    sbar = jnp.zeros_like(beta)

    # residual-norm recurrence state
    betadd = beta
    betad = jnp.zeros_like(beta)
    rhodold = jnp.ones_like(beta)
    tautildeold = jnp.zeros_like(beta)
    thetatilde = jnp.zeros_like(beta)
    zeta = jnp.zeros_like(beta)
    d = jnp.zeros_like(beta)

    normA2 = alpha**2
    normb = beta
    normr = beta
    normar = alpha * beta

    state = (
        X, u, v, h, hbar,
        alpha, beta, zetabar, alphabar, rho, rhobar, cbar, sbar,
        betadd, betad, rhodold, tautildeold, thetatilde, zeta, d,
        normA2, normr, normar, jnp.asarray(0),
    )

    def converged(X, normr, normar, normA2):
        # Fong & Saunders / scipy stopping rules:
        #   S1: normr  <= btol*normb + atol*normA*normx   (residual)
        #   S2: normar <= atol*normA*normr                (normal equations)
        # normx is the CURRENT solution norm — substituting normr here made
        # any operator with normA >= 1/atol "converge" at iteration 0.
        normA = jnp.sqrt(normA2)
        normx = _col_norm(X)
        test1 = normr <= btol * normb + atol * normA * normx
        test2 = normar <= atol * normA * _maxed(normr)
        return jnp.logical_or(test1, test2)

    def _maxed(x):
        return jnp.maximum(x, eps)

    def cond(state):
        X, normA2, normr, normar, k = (
            state[0], state[20], state[21], state[22], state[23]
        )
        return jnp.logical_and(
            k < maxiter,
            jnp.logical_not(jnp.all(converged(X, normr, normar, normA2))),
        )

    def body(state):
        (X, u, v, h, hbar,
         alpha, beta, zetabar, alphabar, rho, rhobar, cbar, sbar,
         betadd, betad, rhodold, tautildeold, thetatilde, zeta, d,
         normA2, normr, normar, k) = state

        active = jnp.logical_not(converged(X, normr, normar, normA2))

        # Golub-Kahan bidiagonalization step
        u = jax.tree.map(lambda av, ul: av - alpha * ul, matvec(v), u)
        beta = _col_norm(u)
        safe_b = jnp.where(beta == 0, 1.0, beta)
        u = _scale(1.0 / safe_b, u)
        v_new = jax.tree.map(lambda atv, vl: atv - beta * vl, rmatvec(u), v)
        alpha_new = _col_norm(v_new)
        safe_a = jnp.where(alpha_new == 0, 1.0, alpha_new)
        v = _scale(1.0 / safe_a, v_new)
        alpha = alpha_new

        # rotation eliminating the damping term
        alphahat = jnp.sqrt(alphabar**2 + damp**2)
        chat = alphabar / alphahat
        shat = damp / alphahat

        # plane rotation flattening the lower bidiagonal
        rhoold = rho
        rho = jnp.sqrt(alphahat**2 + beta**2)
        c = alphahat / rho
        s = beta / rho
        thetanew = s * alpha
        alphabar = c * alpha

        # second rotation for the least-squares subproblem
        rhobarold = rhobar
        zetaold = zeta
        thetabar = sbar * rho
        rhotemp = cbar * rho
        rhobar = jnp.sqrt(rhotemp**2 + thetanew**2)
        cbar = rhotemp / rhobar
        sbar = thetanew / rhobar
        zeta = cbar * zetabar
        zetabar = -sbar * zetabar

        # solution update
        coef_hbar = thetabar * rho / (rhoold * rhobarold)
        hbar = jax.tree.map(lambda hl, hb: hl - coef_hbar * hb, h, hbar)
        step = jnp.where(active, zeta / (rho * rhobar), 0.0)
        X = _axpy(step, hbar, X)
        h = jax.tree.map(lambda vl, hl: vl - (thetanew / rho) * hl, v, h)

        # residual-norm recurrences (LSMR paper section 5)
        betaacute = chat * betadd
        betacheck = -shat * betadd
        betahat = c * betaacute
        betadd = -s * betaacute
        thetatildeold = thetatilde
        rhotildeold = jnp.sqrt(rhodold**2 + thetabar**2)
        ctildeold = rhodold / rhotildeold
        stildeold = thetabar / rhotildeold
        thetatilde = stildeold * rhobar
        rhodold = ctildeold * rhobar
        betad = -stildeold * betad + ctildeold * betahat
        tautildeold = (zetaold - thetatildeold * tautildeold) / rhotildeold
        taud = (zeta - thetatilde * tautildeold) / rhodold
        d = d + betacheck**2
        normr = jnp.sqrt(d + (betad - taud) ** 2 + betadd**2)
        normA2 = normA2 + beta**2 + alpha**2
        normar = jnp.abs(zetabar)

        return (
            X, u, v, h, hbar,
            alpha, beta, zetabar, alphabar, rho, rhobar, cbar, sbar,
            betadd, betad, rhodold, tautildeold, thetatilde, zeta, d,
            normA2, normr, normar, k + 1,
        )

    final = jax.lax.while_loop(cond, body, state)
    X = final[0]
    info = {
        "iterations": final[23],
        "normr": final[21],
        "normar": final[22],
    }
    return X, info
