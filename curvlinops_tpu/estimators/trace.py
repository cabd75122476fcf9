"""Stochastic trace estimators: Hutchinson, Hutch++, XTrace.

Counterparts of ``curvlinops/trace/{hutchinson,meyer2020hutch,
epperly2024xtrace}.py``. All probe matvecs are blocked into matmats, and the
XTrace leave-one-out algebra is fully vectorized (the reference's per-vector
Python loop, ``epperly2024xtrace.py:84-99``, becomes three batched einsums) —
one XLA program per estimate, no host round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from curvlinops_tpu.estimators.sampling import next_default_key, random_matrix


def _check_square(A) -> int:
    rows, cols = A.shape
    if rows != cols:
        raise ValueError(f"Operator must be square, got {A.shape}.")
    return rows


def _check_matvecs(dim: int, num_matvecs: int, divisor: int) -> None:
    if num_matvecs >= dim:
        raise ValueError(
            f"num_matvecs ({num_matvecs}) must be smaller than the dimension "
            f"({dim}); otherwise compute the target exactly."
        )
    if num_matvecs % divisor != 0:
        raise ValueError(f"num_matvecs must be divisible by {divisor}.")


def hutchinson_trace(
    A,
    num_matvecs: int,
    distribution: str = "rademacher",
    key: jax.Array | None = None,
) -> jax.Array:
    """Girard-Hutchinson estimator ``tr(A) ~ 1/N sum v^T A v`` (one matmat)."""
    dim = _check_square(A)
    _check_matvecs(dim, num_matvecs, 1)
    key = next_default_key(key)
    G = random_matrix(key, dim, num_matvecs, distribution, A.dtype)
    return jnp.einsum("ij,ij->", G, A @ G) / num_matvecs


def hutchpp_trace(
    A,
    num_matvecs: int,
    distribution: str = "rademacher",
    key: jax.Array | None = None,
) -> jax.Array:
    """Hutch++ (Meyer et al., 2020): exact low-rank part + deflated Hutchinson."""
    dim = _check_square(A)
    _check_matvecs(dim, num_matvecs, 3)
    m = num_matvecs // 3
    key = next_default_key(key)
    k1, k2 = jax.random.split(key)
    S = random_matrix(k1, dim, m, distribution, A.dtype)
    G = random_matrix(k2, dim, m, distribution, A.dtype)

    Q, _ = jnp.linalg.qr(A @ S)
    # deflate the probes against the sketch basis
    G_defl = G - Q @ (Q.T @ G)
    tr_lowrank = jnp.einsum("ij,ij->", Q, A @ Q)
    tr_residual = jnp.einsum("ij,ij->", G_defl, A @ G_defl) / m
    return tr_lowrank + tr_residual


def xtrace(
    A,
    num_matvecs: int,
    distribution: str = "rademacher",
    key: jax.Array | None = None,
) -> jax.Array:
    """XTrace (Epperly et al., 2024): exchangeable leave-one-out estimator."""
    dim = _check_square(A)
    _check_matvecs(dim, num_matvecs, 2)
    m = num_matvecs // 2
    key = next_default_key(key)
    W = random_matrix(key, dim, m, distribution, A.dtype)
    A_W = A @ W

    Q, R = jnp.linalg.qr(A_W)
    A_Q = A @ Q
    tr_full = jnp.einsum("ij,ij->", Q, A_Q)

    # leave-one-out bases: Q_i Q_i^T = Q (I - s_i s_i^T) Q^T
    RT_inv = jnp.linalg.inv(R.T)
    D = 1.0 / jnp.sqrt(jnp.sum(RT_inv**2, axis=0))
    S = RT_inv * D  # columns s_i

    tr_loo = jnp.einsum("ij,ki,kl,lj->j", S, Q, A_Q, S)

    # deflated Hutchinson per left-out vector, batched over all i at once
    QtW = Q.T @ W  # [m, m]
    defl1 = QtW - S * jnp.einsum("ji,ji->i", S, QtW)
    A_P_W = A_W - A_Q @ defl1
    QtAPW = Q.T @ A_P_W
    defl2 = QtAPW - S * jnp.einsum("ji,ji->i", S, QtAPW)
    PT_A_P_W = A_P_W - Q @ defl2
    tr_hutch = jnp.einsum("ij,ij->j", W, PT_A_P_W)

    return jnp.mean(tr_full - tr_loo + tr_hutch)
