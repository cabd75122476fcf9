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
state as jit arguments via ``LinearOperator.traced_flat``) that is
independent of ``f`` — it returns the ``[repeats, ncv]`` quadrature nodes
and weights, and ``f`` enters only in the tiny eager reduction at the end.
Every spectral map therefore shares the same compiled program — the
TPU-native replacement for the host loop this family usually ships with.

No reorthogonalization: like the spectral-density routines, duplicate Ritz
values can appear for large ``ncv``; their quadrature weights then split, so
``tr(f(A))`` estimates remain well-behaved (Papyan 2020 uses the identical
recurrence).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.estimators.sampling import next_default_key
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
    key = next_default_key(key)
    mv, consts = _flat_matvec(A)

    # The expensive program — vmapped Lanczos over all probes — does not
    # depend on ``f``: it returns the quadrature nodes (Ritz values) and
    # weights. Caching it WITHOUT ``f`` in the key means every spectral map
    # (logdet, tr(A^-1), tr(exp A), per-call lambdas) reuses one compiled
    # program; ``f`` enters only in the tiny eager reduction below.
    def quadrature(v0s, consts):
        def one(v0):
            evals, evecs = _fast_lanczos_loop(mv, consts, v0, ncv, dtype)
            return evals, evecs[0, :] ** 2

        return jax.vmap(one)(v0s)

    program = _cached_program(
        A,
        ("slq_quadrature", ncv, num_repeats),
        lambda: jax.jit(quadrature),
    )
    v0s = jax.random.rademacher(key, (num_repeats, dim), dtype)
    nodes, weights = program(v0s, consts)
    return dim * jnp.mean(jnp.sum(weights * f(nodes), axis=-1))


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
