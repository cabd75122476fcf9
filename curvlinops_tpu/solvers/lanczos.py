"""Lanczos spectral-density estimation (Papyan 2020) — fully on device.

Counterpart of ``curvlinops/papyan2020traces/spectrum.py``. Three deliberate
TPU-native departures from the reference:

- ``fast_lanczos`` runs as a ``lax.fori_loop`` over matvecs with explicit key
  threading (same no-reorthogonalization recurrence, ``spectrum.py:413-474``);
  the small tridiagonal eigenproblem uses dense ``jnp.linalg.eigh``.
- Spectral boundaries come from an on-device Lanczos with full
  reorthogonalization (:func:`lanczos_extreme_eigenvalues`) instead of the
  host ARPACK ``eigsh`` round trip (``spectrum.py:477-543``) — nothing leaves
  the TPU.
- Densities are evaluated with one broadcasted Gaussian-bump expression.

The ``*Cached`` classes memoize Lanczos runs across hyperparameter sweeps
(``spectrum.py:134-222, 344-410``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _flat_matvec(A) -> tuple:
    """``(mv, consts)`` with ``mv(v, consts) == A @ v`` on flat ``[dim]``
    vectors, jit-traceable with operator state in ``consts``.

    ``LinearOperator`` inputs use :meth:`~curvlinops_tpu.ops.base.
    LinearOperator.traced` (state as jit arguments — no large HLO constants);
    anything else (e.g. a raw array-like with ``@``) closes over its state.
    """
    from curvlinops_tpu.ops.base import LinearOperator

    if isinstance(A, LinearOperator):
        fn, consts = A.traced_flat(1)
        return (lambda v, consts: fn(v[:, None], *consts)[:, 0]), consts
    return (lambda v, consts: A @ v), ()


def _cached_program(A, key: tuple, builder):
    """Build-once jitted program stored on the operator instance."""
    from curvlinops_tpu.ops.base import cached_program

    return cached_program(A, key, builder)


def _fast_lanczos_loop(mv, consts, v, ncv: int, dtype):
    """The no-reorthogonalization recurrence as one ``fori_loop`` program."""
    v = v / jnp.linalg.norm(v)
    v_prev = jnp.zeros_like(v)
    alphas = jnp.zeros(ncv, dtype)
    betas = jnp.zeros(max(ncv - 1, 1), dtype)

    def body(m, carry):
        v, v_prev, alphas, betas = carry
        beta_prev = jnp.where(m == 0, 0.0, betas[jnp.maximum(m - 1, 0)])
        v_next = mv(v, consts) - beta_prev * v_prev
        alpha = jnp.vdot(v_next, v)
        alphas = alphas.at[m].set(alpha)
        v_next = v_next - alpha * v
        beta = jnp.linalg.norm(v_next)
        betas = jnp.where(m < ncv - 1, betas.at[jnp.minimum(m, ncv - 2)].set(beta),
                          betas)
        v_next = v_next / jnp.maximum(beta, jnp.finfo(dtype).tiny)
        return v_next, v, alphas, betas

    _, _, alphas, betas = jax.lax.fori_loop(
        0, ncv, body, (v, v_prev, alphas, betas)
    )

    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[: ncv - 1], 1)
        + jnp.diag(betas[: ncv - 1], -1)
    )
    return jnp.linalg.eigh(T)


def fast_lanczos(
    A, ncv: int, key: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Lanczos without reorthogonalization; eigendecomposed tridiagonal.

    The whole run — ``ncv`` operator applications, the recurrence, and the
    tridiagonal ``eigh`` — executes as ONE cached jitted program per
    ``(operator, ncv)``; operator state enters as jit arguments (re-tracing
    the loop body per call was the dominant cost on latency-bound runtimes).

    Args:
        A: Symmetric linear operator (flat ``[dim]`` vectors).
        ncv: Number of Lanczos vectors.
        key: PRNG key for the random start vector.

    Returns:
        ``(evals [ncv], evecs [ncv, ncv])`` of the tridiagonal matrix.
    """
    key = key if key is not None else jax.random.key(0)
    dim = A.shape[1]
    dtype = A.dtype
    v0 = jax.random.normal(key, (dim,), dtype)
    mv, consts = _flat_matvec(A)
    program = _cached_program(
        A,
        ("fast_lanczos", ncv),
        lambda: jax.jit(
            lambda v0, consts: _fast_lanczos_loop(mv, consts, v0, ncv, dtype)
        ),
    )
    return program(v0, consts)


def lanczos_extreme_eigenvalues(
    A, num_iters: int = 32, key: jax.Array | None = None, power: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Extremal eigenvalue estimates via Lanczos WITH full reorthogonalization.

    On-device replacement for ARPACK ``eigsh(k=2, which='BE')``
    (``spectrum.py:477-513``). Extremal Ritz values of a reorthogonalized
    Krylov space converge rapidly for the boundary estimates the spectral
    densities need (the reference uses ``tol=1e-2`` there anyway).

    ``power=2`` runs the recurrence on ``A^2`` (two operator applications
    per step): its extremal Ritz values estimate the squared LARGEST- and
    SMALLEST-MAGNITUDE eigenvalues of ``A`` — the ``which='LM'/'SM'`` pair
    ``approximate_boundaries_abs`` needs for indefinite spectra.

    Returns:
        ``(lambda_min, lambda_max)`` estimates (of ``A^power``).
    """
    key = key if key is not None else jax.random.key(0)
    dim = A.shape[1]
    ncv = min(num_iters, dim)
    dtype = A.dtype
    v0 = jax.random.normal(key, (dim,), dtype)
    mv1, consts = _flat_matvec(A)

    def mv(v, consts):
        for _ in range(power):
            v = mv1(v, consts)
        return v

    def loop(v0, consts):
        v = v0 / jnp.linalg.norm(v0)
        V = jnp.zeros((ncv, dim), dtype)
        alphas = jnp.zeros(ncv, dtype)
        betas = jnp.zeros(ncv, dtype)

        def body(m, carry):
            v, V, alphas, betas = carry
            V = V.at[m].set(v)
            w = mv(v, consts)
            alpha = jnp.vdot(w, v)
            alphas = alphas.at[m].set(alpha)
            # full reorthogonalization against the stored basis
            w = w - V.T @ (V @ w)
            w = w - V.T @ (V @ w)  # twice is enough
            beta = jnp.linalg.norm(w)
            betas = betas.at[m].set(beta)
            v = w / jnp.maximum(beta, jnp.finfo(dtype).tiny)
            return v, V, alphas, betas

        _, _, alphas, betas = jax.lax.fori_loop(
            0, ncv, body, (v, V, alphas, betas)
        )

        T = (
            jnp.diag(alphas)
            + jnp.diag(betas[: ncv - 1], 1)
            + jnp.diag(betas[: ncv - 1], -1)
        )
        ritz = jnp.linalg.eigvalsh(T)
        return ritz[0], ritz[-1]

    program = _cached_program(
        A, ("lanczos_extreme", ncv, power), lambda: jax.jit(loop)
    )
    return program(v0, consts)


def lanczos_eigsh(
    A, which: str = "BE", tol: float = 1e-2, key: jax.Array | None = None
):
    """``eigsh``-style extremal-eigenvalue selector, fully on device.

    API-parity counterpart of the reference's ARPACK calls in
    ``spectrum.py:477-543`` (``eigsh(..., which=...)``), dispatched over the
    power-1 / power-2 reorthogonalized Lanczos runs:

    - ``"BE"``: both ends — returns ``(lambda_min, lambda_max)`` (signed).
    - ``"SA"`` / ``"LA"``: smallest / largest algebraic eigenvalue (signed
      float).
    - ``"LM"`` / ``"SM"``: largest / smallest MAGNITUDE, returned as the
      magnitude (the reference applies ``abs`` to these estimates before
      use, ``spectrum.py:543``). Estimated from Lanczos on ``A^2`` so that
      indefinite spectra resolve the near-zero end correctly.

    Args:
        A: Symmetric linear operator (flat ``[dim]`` vectors).
        which: One of ``{"BE", "SA", "LA", "LM", "SM"}``.
        tol: Relative accuracy; sets the Lanczos iteration count like the
            reference's ``eigsh(tol=...)`` default usage.
        key: PRNG key for the start vector.

    Returns:
        ``(lambda_min, lambda_max)`` for ``"BE"``; a single float otherwise.

    Raises:
        ValueError: For an unknown selector.
    """
    num_iters = max(8, int(4 / math.sqrt(tol)))
    if which in ("BE", "SA", "LA"):
        lo, hi = lanczos_extreme_eigenvalues(A, num_iters=num_iters, key=key)
        if which == "BE":
            return float(lo), float(hi)
        return float(lo) if which == "SA" else float(hi)
    if which in ("LM", "SM"):
        lo2, hi2 = lanczos_extreme_eigenvalues(
            A, num_iters=num_iters, key=key, power=2
        )
        sq = lo2 if which == "SM" else hi2
        return float(jnp.sqrt(jnp.maximum(sq, 0.0)))
    raise ValueError(
        f"Unknown selector which={which!r}; expected BE, SA, LA, LM, or SM."
    )


def approximate_boundaries(
    A, tol: float = 1e-2, boundaries=None, key: jax.Array | None = None
) -> tuple[float, float]:
    """Estimate ``(lambda_min, lambda_max)`` of a symmetric operator."""
    if boundaries is not None and None not in boundaries:
        return boundaries
    lo, hi = lanczos_eigsh(A, which="BE", tol=tol, key=key)
    if boundaries is not None:
        given_lo, given_hi = boundaries
        lo = lo if given_lo is None else given_lo
        hi = hi if given_hi is None else given_hi
    return lo, hi


def approximate_boundaries_abs(
    A, tol: float = 1e-2, boundaries=None, key: jax.Array | None = None
) -> tuple[float, float]:
    """Estimate ``(lambda_min, lambda_max)`` of ``|A|``.

    Runs Lanczos on ``A^2``: its extremal Ritz values estimate the squared
    largest- and SMALLEST-MAGNITUDE eigenvalues of ``A`` — the reference's
    ``eigsh(which='LM')`` / ``which='SM'`` pair (``spectrum.py:513-543``).
    ``min(|lambda_min|, |lambda_max|)`` of the SIGNED extremes would be
    wrong for indefinite spectra (an NN Hessian straddling zero has
    ``lambda_min(|A|)`` near 0, not near the magnitude of either extreme),
    windowing the log-density grid away from the spectral bulk.
    """
    if boundaries is not None and None not in boundaries:
        return boundaries
    num_iters = max(8, int(4 / math.sqrt(tol)))
    lo2, hi2 = lanczos_extreme_eigenvalues(
        A, num_iters=num_iters, key=key, power=2
    )
    est_lo = float(jnp.sqrt(jnp.maximum(lo2, 0.0)))
    est_hi = float(jnp.sqrt(jnp.maximum(hi2, 0.0)))
    if boundaries is not None:
        given_lo, given_hi = boundaries
        est_lo = est_lo if given_lo is None else given_lo
        est_hi = est_hi if given_hi is None else given_hi
    return est_lo, est_hi


def _gaussian_density(
    nodes: jax.Array, weights: jax.Array, grid: jax.Array, sigma: float
) -> jax.Array:
    """Sum of Gaussian bumps at ``nodes`` with ``weights`` over ``grid``."""
    z = (grid[None, :] - nodes[:, None]) / sigma
    bumps = jnp.exp(-0.5 * z**2) / (sigma * math.sqrt(2 * math.pi))
    return jnp.sum(weights[:, None] * bumps, axis=0)


def lanczos_approximate_spectrum_from_iter(
    lanczos_iter, boundaries, num_points: int, kappa: float, margin: float
):
    """Density from one Lanczos run (``spectrum.py:84-131``)."""
    eval_min, eval_max = boundaries
    padding = margin * (eval_max - eval_min)
    eval_min, eval_max = eval_min - padding, eval_max + padding
    c = (eval_max + eval_min) / 2
    d = (eval_max - eval_min) / 2

    evals, evecs = lanczos_iter
    ncv = evals.shape[0]
    grid_norm = jnp.linspace(-1.0, 1.0, num_points, dtype=evals.dtype)
    nodes = (evals - c) / d
    weights = evecs[0, :] ** 2 / d
    sigma = 2 / (ncv - 1) / math.sqrt(8 * math.log(kappa))
    density = _gaussian_density(nodes, weights, grid_norm, sigma)
    grid = jnp.linspace(eval_min, eval_max, num_points, dtype=evals.dtype)
    return grid, density


def lanczos_approximate_log_spectrum_from_iter(
    lanczos_iter, boundaries, num_points: int, kappa: float, margin: float,
    epsilon: float,
):
    """Log-spectrum density from one Lanczos run (``spectrum.py:290-341``)."""
    log_min, log_max = (math.log(b + epsilon) for b in boundaries)
    padding = margin * (log_max - log_min)
    log_min, log_max = log_min - padding, log_max + padding
    c = (log_max + log_min) / 2
    d = (log_max - log_min) / 2

    evals, evecs = lanczos_iter
    ncv = evals.shape[0]
    grid_norm = jnp.linspace(-1.0, 1.0, num_points, dtype=evals.dtype)
    grid_out = jnp.exp(grid_norm * d + c)
    nodes = (jnp.log(jnp.abs(evals) + epsilon) - c) / d
    weights = evecs[0, :] ** 2
    sigma = 2 / (ncv - 1) / math.sqrt(8 * math.log(kappa))
    density = _gaussian_density(nodes, weights, grid_norm, sigma) / (d * grid_out)
    return grid_out, density


def lanczos_approximate_spectrum(
    A,
    ncv: int,
    num_points: int = 1024,
    num_repeats: int = 1,
    kappa: float = 3.0,
    boundaries=None,
    margin: float = 0.05,
    boundaries_tol: float = 1e-2,
    key: jax.Array | None = None,
):
    """Approximate the spectral density of a symmetric operator.

    Implements Papyan 2020, Algorithm 2 (``spectrum.py:28-83``).
    """
    key = key if key is not None else jax.random.key(0)
    kb, key = jax.random.split(key)
    boundaries = approximate_boundaries(A, tol=boundaries_tol,
                                        boundaries=boundaries, key=kb)
    avg = None
    for n in range(num_repeats):
        it = fast_lanczos(A, ncv, key=jax.random.fold_in(key, n))
        grid, density = lanczos_approximate_spectrum_from_iter(
            it, boundaries, num_points, kappa, margin
        )
        avg = density if avg is None else (1 - 1 / (n + 1)) * avg + density / (n + 1)
    return grid, avg


def lanczos_approximate_log_spectrum(
    A,
    ncv: int,
    num_points: int = 1024,
    num_repeats: int = 1,
    kappa: float = 1.04,
    boundaries=None,
    margin: float = 0.05,
    boundaries_tol: float = 1e-2,
    epsilon: float = 1e-5,
    key: jax.Array | None = None,
):
    """Approximate the spectral density of ``log(|A| + eps I)``."""
    key = key if key is not None else jax.random.key(0)
    kb, key = jax.random.split(key)
    boundaries = approximate_boundaries_abs(
        A, tol=boundaries_tol, boundaries=boundaries, key=kb
    )
    avg = None
    for n in range(num_repeats):
        it = fast_lanczos(A, ncv, key=jax.random.fold_in(key, n))
        grid, density = lanczos_approximate_log_spectrum_from_iter(
            it, boundaries, num_points, kappa, margin, epsilon
        )
        avg = density if avg is None else (1 - 1 / (n + 1)) * avg + density / (n + 1)
    return grid, avg


class _LanczosSpectrumCached:
    """Memoizes Lanczos runs across hyperparameter sweeps (``spectrum.py:134``)."""

    def __init__(self, A, ncv: int, key: jax.Array | None = None):
        self._A, self._ncv = A, ncv
        self._key = key if key is not None else jax.random.key(0)
        self._iters: list = []

    def _ensure_iters(self, num_repeats: int) -> None:
        while len(self._iters) < num_repeats:
            self._iters.append(
                fast_lanczos(
                    self._A, self._ncv,
                    key=jax.random.fold_in(self._key, len(self._iters)),
                )
            )


class LanczosApproximateSpectrumCached(_LanczosSpectrumCached):
    """Spectrum approximator reusing cached Lanczos iterations."""

    def __init__(
        self, A, ncv: int, boundaries=None, boundaries_tol: float = 1e-2,
        key: jax.Array | None = None,
    ):
        super().__init__(A, ncv, key)
        kb = jax.random.fold_in(self._key, 2**31)
        self._boundaries = approximate_boundaries(
            A, tol=boundaries_tol, boundaries=boundaries, key=kb
        )

    def approximate_spectrum(
        self, num_repeats: int = 1, num_points: int = 1024, kappa: float = 3.0,
        margin: float = 0.05,
    ):
        """Density averaged over (cached) Lanczos repeats."""
        self._ensure_iters(num_repeats)
        avg, grid = None, None
        for n in range(num_repeats):
            grid, density = lanczos_approximate_spectrum_from_iter(
                self._iters[n], self._boundaries, num_points, kappa, margin
            )
            avg = (
                density if avg is None
                else (1 - 1 / (n + 1)) * avg + density / (n + 1)
            )
        return grid, avg


class LanczosApproximateLogSpectrumCached(_LanczosSpectrumCached):
    """Log-spectrum approximator reusing cached Lanczos iterations."""

    def __init__(
        self, A, ncv: int, boundaries=None, boundaries_tol: float = 1e-2,
        key: jax.Array | None = None,
    ):
        super().__init__(A, ncv, key)
        kb = jax.random.fold_in(self._key, 2**31)
        self._boundaries = approximate_boundaries_abs(
            A, tol=boundaries_tol, boundaries=boundaries, key=kb
        )

    def approximate_log_spectrum(
        self, num_repeats: int = 1, num_points: int = 1024, kappa: float = 1.04,
        margin: float = 0.05, epsilon: float = 1e-5,
    ):
        """Log-density averaged over (cached) Lanczos repeats."""
        self._ensure_iters(num_repeats)
        avg, grid = None, None
        for n in range(num_repeats):
            grid, density = lanczos_approximate_log_spectrum_from_iter(
                self._iters[n], self._boundaries, num_points, kappa, margin,
                epsilon,
            )
            avg = (
                density if avg is None
                else (1 - 1 / (n + 1)) * avg + density / (n + 1)
            )
        return grid, avg
