"""Stochastic Lanczos quadrature estimators vs dense ground truths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import (
    GGNLinearOperator,
    IdentityLinearOperator,
    MSELoss,
    slq_function_trace,
    slq_logdet,
)
from curvlinops_tpu.ops.dense import MatrixLinearOperator


def _spd_operator(dim=80, lo=0.5, hi=4.0, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    evs = np.linspace(lo, hi, dim)
    dense = (Q * evs) @ Q.T
    return MatrixLinearOperator(jnp.asarray(dense, jnp.float32)), evs


def test_slq_logdet_dense():
    A, evs = _spd_operator()
    est = float(slq_logdet(A, ncv=40, num_repeats=64, key=jax.random.key(1)))
    exact = float(np.sum(np.log(evs)))
    assert abs(est - exact) / abs(exact) < 0.05


def test_slq_function_trace_inverse_and_identity():
    A, evs = _spd_operator(seed=1)
    est = float(
        slq_function_trace(A, lambda t: 1.0 / t, ncv=40, num_repeats=64,
                           key=jax.random.key(2))
    )
    exact = float(np.sum(1.0 / evs))
    assert abs(est - exact) / abs(exact) < 0.05
    # f = identity reduces to plain Hutchinson: tr(A) recovered exactly in
    # expectation; with 64 probes demand 5%
    est_tr = float(
        slq_function_trace(A, lambda t: t, ncv=40, num_repeats=64,
                           key=jax.random.key(3))
    )
    assert abs(est_tr - float(np.sum(evs))) / float(np.sum(evs)) < 0.05


def test_slq_logdet_damped_ggn():
    """SLQ logdet of a damped curvature operator matches dense slogdet."""
    k = jax.random.key(4)
    params = {
        "W1": 0.4 * jax.random.normal(jax.random.fold_in(k, 1), (6, 8)),
        "W2": 0.4 * jax.random.normal(jax.random.fold_in(k, 2), (8, 4)),
    }
    model = lambda p, x: jnp.tanh(x @ p["W1"]) @ p["W2"]  # noqa: E731
    X = jax.random.normal(jax.random.fold_in(k, 3), (32, 6))
    y = jax.random.normal(jax.random.fold_in(k, 4), (32, 4))
    G = GGNLinearOperator(model, MSELoss("mean"), params, [(X, y)],
                          check_deterministic=False)
    damped = G + 0.5 * IdentityLinearOperator(G.in_spec)
    dim = damped.shape[0]
    est = float(slq_logdet(damped, ncv=dim, num_repeats=64,
                           key=jax.random.key(5)))
    exact = float(np.linalg.slogdet(np.asarray(damped.todense()))[1])
    assert abs(est - exact) / abs(exact) < 0.05


def test_slq_validation():
    A, _ = _spd_operator(dim=16)
    with pytest.raises(ValueError):
        slq_logdet(A, ncv=17)
    with pytest.raises(ValueError):
        slq_logdet(A, ncv=8, num_repeats=0)


def test_slq_program_cached():
    """The quadrature program is independent of ``f``: repeated calls —
    including ``slq_logdet``'s per-call lambdas and entirely different
    spectral maps — reuse ONE compiled program."""
    A, _ = _spd_operator(dim=32, seed=2)
    slq_logdet(A, ncv=16, num_repeats=4)
    n_programs = len(A._program_cache[1])
    slq_logdet(A, ncv=16, num_repeats=4, key=jax.random.key(9))
    slq_function_trace(A, jnp.exp, ncv=16, num_repeats=4)
    slq_function_trace(A, lambda t: 1.0 / t, ncv=16, num_repeats=4)
    assert len(A._program_cache[1]) == n_programs


def test_program_cache_evicted_on_epoch_bump():
    """Bumping the traced epoch EVICTS stale programs instead of stranding
    them in the instance dict forever."""
    A, _ = _spd_operator(dim=32, seed=4)
    slq_logdet(A, ncv=8, num_repeats=2)
    assert len(A._program_cache[1]) == 1
    A.invalidate_traced()
    slq_logdet(A, ncv=8, num_repeats=2)
    assert len(A._program_cache[1]) == 1  # old-epoch entry evicted
