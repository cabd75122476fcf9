"""Trace/diagonal/norm estimators: convergence and validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import MatrixLinearOperator
from curvlinops_tpu.estimators.diagonal import hutchinson_diag, xdiag
from curvlinops_tpu.estimators.norm import hutchinson_squared_fro
from curvlinops_tpu.estimators.trace import hutchinson_trace, hutchpp_trace, xtrace

from tests.utils import report_nonclose

DIM = 120


@pytest.fixture
def spd_op():
    key = jax.random.key(0)
    A = jax.random.normal(key, (DIM, DIM)) / np.sqrt(DIM)
    M = A @ A.T + jnp.eye(DIM)
    return MatrixLinearOperator(M), np.asarray(M)


def _averaged(estimator, op, num_matvecs, n_seeds=40, **kw):
    vals = [
        np.asarray(estimator(op, num_matvecs, key=jax.random.key(s), **kw))
        for s in range(n_seeds)
    ]
    return np.mean(vals, axis=0)


@pytest.mark.parametrize("distribution", ["rademacher", "normal"])
def test_hutchinson_trace_converges(spd_op, distribution):
    op, M = spd_op
    est = _averaged(hutchinson_trace, op, 60, distribution=distribution)
    assert abs(est - np.trace(M)) / abs(np.trace(M)) < 0.03


def test_hutchpp_trace_converges(spd_op):
    op, M = spd_op
    est = _averaged(hutchpp_trace, op, 60)
    assert abs(est - np.trace(M)) / abs(np.trace(M)) < 0.02


def test_xtrace_converges(spd_op):
    op, M = spd_op
    est = _averaged(xtrace, op, 60, n_seeds=10)
    assert abs(est - np.trace(M)) / abs(np.trace(M)) < 0.01


def test_hutchinson_diag_converges(spd_op):
    op, M = spd_op
    est = _averaged(hutchinson_diag, op, 64, n_seeds=250)
    scale = np.abs(np.diag(M)).max()
    assert np.abs(est - np.diag(M)).max() / scale < 0.15


def test_xdiag_converges(spd_op):
    op, M = spd_op
    est = _averaged(xdiag, op, 64, n_seeds=120)
    scale = np.abs(np.diag(M)).max()
    assert np.abs(est - np.diag(M)).max() / scale < 0.15


def test_xdiag_beats_hutchinson_on_decaying_spectrum():
    """Deflation pays off when a few directions dominate the spectrum."""
    key = jax.random.key(9)
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (DIM, DIM)))
    evals = jnp.concatenate([jnp.asarray([500.0, 200.0, 100.0, 50.0]),
                             0.1 * jnp.ones(DIM - 4)])
    M = (Q * evals) @ Q.T
    op = MatrixLinearOperator(M)
    est_x = _averaged(xdiag, op, 64, n_seeds=30)
    est_h = _averaged(hutchinson_diag, op, 64, n_seeds=30)
    err_x = np.abs(est_x - np.diag(np.asarray(M))).max()
    err_h = np.abs(est_h - np.diag(np.asarray(M))).max()
    assert err_x < err_h, (err_x, err_h)


def test_squared_fro_converges(spd_op):
    op, M = spd_op
    est = _averaged(hutchinson_squared_fro, op, 60)
    truth = np.linalg.norm(M) ** 2
    assert abs(est - truth) / truth < 0.03


def test_squared_fro_rectangular():
    A = jax.random.normal(jax.random.key(1), (30, 200))
    op = MatrixLinearOperator(A)
    est = _averaged(hutchinson_squared_fro, op, 20, n_seeds=60)
    truth = float(jnp.sum(A**2))
    assert abs(est - truth) / truth < 0.05


def test_validation_errors(spd_op):
    op, _ = spd_op
    with pytest.raises(ValueError):
        xtrace(op, 7)  # not divisible by 2
    with pytest.raises(ValueError):
        hutchpp_trace(op, 8)  # not divisible by 3
    with pytest.raises(ValueError):
        hutchinson_trace(op, DIM + 2)  # too many matvecs
    rect = MatrixLinearOperator(jnp.ones((4, 6)))
    with pytest.raises(ValueError):
        hutchinson_trace(rect, 2)  # not square


def test_default_keys_decorrelate_repeats():
    """Without an explicit key, repeated estimator calls must draw fresh
    probes (a fixed default made averaging-over-repeats useless — 100
    'independent' estimates with the variance of one)."""
    import curvlinops_tpu as cl

    # NOT diagonal: Rademacher probes are exact on diagonals regardless of key
    mat = jax.random.normal(jax.random.key(0), (32, 32))
    A = cl.MatrixLinearOperator(mat @ mat.T)
    e1 = float(cl.hutchinson_trace(A, num_matvecs=4))
    e2 = float(cl.hutchinson_trace(A, num_matvecs=4))
    assert e1 != e2  # fresh probes per call
    k = jax.random.key(3)
    r1 = float(cl.hutchinson_trace(A, num_matvecs=4, key=k))
    r2 = float(cl.hutchinson_trace(A, num_matvecs=4, key=k))
    assert r1 == r2  # explicit keys stay reproducible
