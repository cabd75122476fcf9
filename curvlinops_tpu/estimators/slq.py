"""Stochastic Lanczos quadrature: ``tr(f(A))`` for matrix functions.

Beyond the reference (whose estimator layer covers trace/diagonal/norm of
``A`` itself, ``curvlinops/trace``, ``/diagonal``, ``/norm``): SLQ estimates
traces of matrix FUNCTIONS — ``logdet(A) = tr(log A)``, ``tr(A^{-1})``,
``tr(exp(A))`` — from the same Lanczos machinery that powers the spectral
densities (Ubaru, Chen & Saad 2017, "Fast estimation of tr(f(A)) via
stochastic Lanczos quadrature").

Per probe vector ``v`` (Rademacher, so ``||v||^2 == dim`` exactly), ``ncv``
Lanczos steps give the tridiagonal eigenpairs ``(theta, U)``; Gauss
quadrature reads ``v^T f(A) v ~ dim * sum_k U[0,k]^2 f(theta_k)``. All
probes run inside ONE cached jitted program (vmapped Lanczos loops; operator
state as jit arguments via ``LinearOperator.traced_flat``), so the whole
estimate is a single device dispatch — the TPU-native replacement for the
host loop this family usually ships with.

No reorthogonalization: like the spectral-density routines, duplicate Ritz
values can appear for large ``ncv``; their quadrature weights then split, so
``tr(f(A))`` estimates remain well-behaved (Papyan 2020 uses the identical
recurrence).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.estimators.trace import _check_square
from curvlinops_tpu.solvers.lanczos import (
    _cached_program,
    _fast_lanczos_loop,
    _flat_matvec,
)


def slq_function_trace(
    A,
    f: Callable[[jax.Array], jax.Array],
    ncv: int = 64,
    num_repeats: int = 8,
    key: jax.Array | None = None,
) -> jax.Array:
    """Estimate ``tr(f(A))`` for symmetric ``A`` by stochastic Lanczos
    quadrature.

    Args:
        A: Symmetric linear operator (``LinearOperator`` or array-like).
        f: Elementwise spectral map applied to the Ritz values (traced under
            jit; use ``jnp`` functions).
        ncv: Lanczos steps per probe — quadrature nodes (accuracy in the
            spectrum's resolution).
        num_repeats: Number of Rademacher probes — variance of the
            Hutchinson-type average.
        key: PRNG key for the probes.

    Returns:
        Scalar estimate of ``tr(f(A))`` (device array).
    """
    dim = _check_square(A)
    if not 0 < ncv <= dim:
        raise ValueError(f"ncv must be in (0, {dim}], got {ncv}.")
    if num_repeats <= 0:
        raise ValueError(f"num_repeats must be positive, got {num_repeats}.")
    dtype = A.dtype
    key = key if key is not None else jax.random.key(0)
    mv, consts = _flat_matvec(A)

    def estimate(v0s, consts):
        def one(v0):
            evals, evecs = _fast_lanczos_loop(mv, consts, v0, ncv, dtype)
            weights = evecs[0, :] ** 2
            return jnp.sum(weights * f(evals))

        return dim * jnp.mean(jax.vmap(one)(v0s))

    program = _cached_program(
        A,
        ("slq", ncv, num_repeats, id(f)),
        lambda: jax.jit(estimate),
    )
    v0s = jax.random.rademacher(key, (num_repeats, dim), dtype)
    return program(v0s, consts)


def slq_logdet(
    A,
    ncv: int = 64,
    num_repeats: int = 8,
    key: jax.Array | None = None,
    eps: float | None = None,
) -> jax.Array:
    """Estimate ``logdet(A) = tr(log A)`` of a symmetric positive-definite
    operator by stochastic Lanczos quadrature.

    Ritz values are clamped to ``eps`` (default: the dtype's tiny) before the
    log — indefinite or numerically singular operators produce large-negative
    contributions rather than NaNs; damp the operator (``A + delta * I``) for
    meaningful values near singularity.
    """
    tiny = jnp.finfo(A.dtype).tiny if eps is None else eps
    return slq_function_trace(
        A,
        lambda t: jnp.log(jnp.maximum(t, tiny)),
        ncv=ncv,
        num_repeats=num_repeats,
        key=key,
    )
