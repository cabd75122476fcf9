"""Lanczos spectral densities, boundaries, and top-k eigenpairs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import MatrixLinearOperator
from curvlinops_tpu.solvers.eigsh import topk_eigenpairs
from curvlinops_tpu.solvers.lanczos import (
    LanczosApproximateLogSpectrumCached,
    LanczosApproximateSpectrumCached,
    approximate_boundaries,
    approximate_boundaries_abs,
    fast_lanczos,
    lanczos_approximate_log_spectrum,
    lanczos_approximate_spectrum,
)


@pytest.fixture
def spd_op():
    key = jax.random.key(0)
    A = jax.random.normal(key, (80, 80)) / np.sqrt(80)
    M = A @ A.T + 0.5 * jnp.eye(80)
    return MatrixLinearOperator(M), np.asarray(M)


def test_boundaries(spd_op):
    op, M = spd_op
    evals = np.linalg.eigvalsh(M)
    lo, hi = approximate_boundaries(op, key=jax.random.key(1))
    assert abs(hi - evals[-1]) / evals[-1] < 0.02
    assert lo <= evals[0] * 1.2 and lo > 0

    alo, ahi = approximate_boundaries_abs(op, key=jax.random.key(2))
    assert abs(ahi - evals[-1]) / evals[-1] < 0.02

    # partially specified boundaries pass through
    lo2, hi2 = approximate_boundaries(op, boundaries=(0.1, None))
    assert lo2 == 0.1 and abs(hi2 - evals[-1]) / evals[-1] < 0.02


@pytest.fixture
def indefinite_op():
    """Indefinite symmetric matrix with distinct |.|-extremes vs signed ones."""
    key = jax.random.key(7)
    A = jax.random.normal(key, (60, 60)) / np.sqrt(60)
    M = (A + A.T) / 2 - 0.3 * jnp.eye(60)
    return MatrixLinearOperator(M), np.asarray(M)


@pytest.mark.parametrize("which", ["BE", "SA", "LA", "LM", "SM"])
def test_lanczos_eigsh_selectors(indefinite_op, which):
    """Every eigsh-style selector matches dense ``eigvalsh``."""
    from curvlinops_tpu import lanczos_eigsh

    op, M = indefinite_op
    evals = np.linalg.eigvalsh(M)
    scale = max(abs(evals[0]), abs(evals[-1]))
    got = lanczos_eigsh(op, which=which, key=jax.random.key(4))
    if which == "BE":
        lo, hi = got
        assert abs(lo - evals[0]) / scale < 0.02
        assert abs(hi - evals[-1]) / scale < 0.02
    elif which == "SA":
        assert abs(got - evals[0]) / scale < 0.02
    elif which == "LA":
        assert abs(got - evals[-1]) / scale < 0.02
    elif which == "LM":
        assert abs(got - np.abs(evals).max()) / scale < 0.02
    else:  # SM — near-zero end of |A|; absolute tolerance on the magnitude
        assert abs(got - np.abs(evals).min()) / scale < 0.05


def test_lanczos_eigsh_rejects_unknown_selector(indefinite_op):
    from curvlinops_tpu import lanczos_eigsh

    with pytest.raises(ValueError, match="selector"):
        lanczos_eigsh(indefinite_op[0], which="XX")


def test_fast_lanczos_full_rank_recovers_eigvals():
    """With ncv == dim and a well-separated spectrum, Ritz == eigenvalues."""
    M = jnp.diag(jnp.asarray([1.0, 3.0, 7.0, 15.0, 40.0]))
    op = MatrixLinearOperator(M)
    evals, _ = fast_lanczos(op, 5, key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(evals), [1, 3, 7, 15, 40], rtol=1e-3)


def test_spectrum_density_integrates_to_one(spd_op):
    op, M = spd_op
    grid, density = lanczos_approximate_spectrum(
        op, ncv=64, num_points=512, num_repeats=4, key=jax.random.key(3)
    )
    integral = float(jnp.trapezoid(density, grid))
    assert abs(integral - 1.0) < 0.05, integral


def test_log_spectrum_density_integrates_to_one(spd_op):
    op, M = spd_op
    grid, density = lanczos_approximate_log_spectrum(
        op, ncv=64, num_points=512, num_repeats=4, key=jax.random.key(4)
    )
    integral = float(jnp.trapezoid(density, grid))
    assert abs(integral - 1.0) < 0.1, integral


def test_cached_spectrum_matches_and_extends(spd_op):
    op, _ = spd_op
    cached = LanczosApproximateSpectrumCached(op, ncv=32, key=jax.random.key(5))
    g1, d1 = cached.approximate_spectrum(num_repeats=2, num_points=256)
    assert len(cached._iters) == 2
    g2, d2 = cached.approximate_spectrum(num_repeats=4, num_points=256)
    assert len(cached._iters) == 4
    # the first call's result is reproducible from the cache
    g1b, d1b = cached.approximate_spectrum(num_repeats=2, num_points=256)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1b), rtol=1e-6)

    log_cached = LanczosApproximateLogSpectrumCached(
        op, ncv=32, key=jax.random.key(6)
    )
    g, d = log_cached.approximate_log_spectrum(num_repeats=2, num_points=256)
    assert np.isfinite(np.asarray(d)).all()


def test_topk_eigenpairs(spd_op):
    op, M = spd_op
    evals, evecs = topk_eigenpairs(op, k=4, maxiter=200, key=jax.random.key(7))
    ref = np.linalg.eigvalsh(M)[::-1][:4]
    np.testing.assert_allclose(np.asarray(evals), ref, rtol=1e-3)
    # eigenvector residuals
    R = np.asarray(M) @ np.asarray(evecs) - np.asarray(evecs) * np.asarray(evals)
    assert np.abs(R).max() < 1e-2


def test_boundaries_abs_indefinite_spectrum():
    """lambda_min(|A|) is the smallest-MAGNITUDE eigenvalue (reference
    eigsh(which='SM')) — for a spectrum straddling zero it sits near 0, not
    at min(|extremes|)."""
    d = jnp.asarray([-5.0, -1.0, 0.01, 0.5, 3.0, 10.0])
    op = MatrixLinearOperator(jnp.diag(d))
    lo, hi = approximate_boundaries_abs(op)
    assert abs(hi - 10.0) < 0.5
    assert lo < 0.1  # the old min(|lo|,|hi|) returned 5.0
