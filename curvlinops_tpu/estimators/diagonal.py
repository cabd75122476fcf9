"""Stochastic diagonal estimators: Hutchinson and XDiag.

Counterparts of ``curvlinops/diagonal/{hutchinson,epperly2024xtrace}.py``;
XDiag's leave-one-out loop (``diagonal/epperly2024xtrace.py:75-88``) is
batched into einsums like the XTrace port.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from curvlinops_tpu.estimators.sampling import next_default_key, random_matrix
from curvlinops_tpu.estimators.trace import _check_matvecs, _check_square


def hutchinson_diag(
    A,
    num_matvecs: int,
    distribution: str = "rademacher",
    key: jax.Array | None = None,
) -> jax.Array:
    """``diag(A) ~ 1/N sum v (.) A v`` in one blocked matmat."""
    dim = _check_square(A)
    _check_matvecs(dim, num_matvecs, 1)
    key = next_default_key(key)
    G = random_matrix(key, dim, num_matvecs, distribution, A.dtype)
    return jnp.einsum("ij,ij->i", G, A @ G) / num_matvecs


def xdiag(A, num_matvecs: int, key: jax.Array | None = None) -> jax.Array:
    """XDiag (Epperly et al., 2024); Rademacher probes only."""
    dim = _check_square(A)
    _check_matvecs(dim, num_matvecs, 2)
    m = num_matvecs // 2
    key = next_default_key(key)
    W = random_matrix(key, dim, m, "rademacher", A.dtype)
    A_W = A @ W

    Q, R = jnp.linalg.qr(A_W)
    # Q^T A via the adjoint (the left-multiplication of the reference)
    QT_A = (A.adjoint() @ Q).T if hasattr(A, "adjoint") else Q.T @ A
    diag_full = jnp.einsum("ij,ji->i", Q, QT_A)

    RT_inv = jnp.linalg.inv(R.T)
    D = 1.0 / jnp.sqrt(jnp.sum(RT_inv**2, axis=0))
    S = RT_inv * D

    diag_correction = jnp.einsum("ij,jk,lk,li->i", Q, S, S, QT_A) / m

    # batched deflated Hutchinson over the left-out vectors
    QTAW = QT_A @ W  # [m, m]
    defl = QTAW - S * jnp.einsum("ji,ji->i", S, QTAW)
    A_comp_W = A_W - Q @ defl  # [dim, m]
    diag_hutch = jnp.sum(W * A_comp_W / (W**2), axis=1) / m

    return diag_full - diag_correction + diag_hutch
