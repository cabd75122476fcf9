"""Property-based operator algebra: random expression trees vs dense mirrors.

Hypothesis builds random compositions of the lazy algebra (sum, scalar
scale, negation, chain, adjoint) over random base operators and checks
``todense`` of the composite against the same expression evaluated on dense
matrices — plus format coherence (flat jax / numpy / matvec-vs-matmat) and
adjoint correctness on every sampled expression.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

import curvlinops_tpu as cl

DIM = 6


def _base_operator(draw):
    kind = draw(st.sampled_from(["matrix", "diagonal", "identity", "outer"]))
    seed = draw(st.integers(0, 2**16))
    rng = np.random.default_rng(seed)
    if kind == "matrix":
        dense = rng.normal(size=(DIM, DIM)).astype(np.float32)
        return cl.MatrixLinearOperator(jnp.asarray(dense)), dense
    if kind == "diagonal":
        d = rng.normal(size=DIM).astype(np.float32)
        return cl.DiagonalLinearOperator(jnp.asarray(d)), np.diag(d)
    if kind == "outer":
        c = float(rng.uniform(0.5, 2.0))
        a = rng.normal(size=DIM).astype(np.float32)
        return (
            cl.OuterProductLinearOperator(jnp.asarray(a), c),
            c * np.outer(a, a),
        )
    spec = jax.ShapeDtypeStruct((DIM,), jnp.float32)
    return cl.IdentityLinearOperator(spec), np.eye(DIM, dtype=np.float32)


@st.composite
def expressions(draw, depth=0):
    """(operator, dense ndarray) pairs for random algebra expressions."""
    if depth >= 2 or draw(st.booleans()):
        return _base_operator(draw)
    combinator = draw(st.sampled_from(["sum", "scale", "chain", "neg", "adj"]))
    op_a, d_a = draw(expressions(depth=depth + 1))
    if combinator == "sum":
        op_b, d_b = draw(expressions(depth=depth + 1))
        return op_a + op_b, d_a + d_b
    if combinator == "chain":
        op_b, d_b = draw(expressions(depth=depth + 1))
        return op_a @ op_b, d_a @ d_b
    if combinator == "scale":
        c = draw(
            st.floats(-3.0, 3.0, allow_nan=False).filter(lambda v: abs(v) > 1e-3)
        )
        return c * op_a, np.float32(c) * d_a
    if combinator == "neg":
        return -op_a, -d_a
    return op_a.T, d_a.T


@settings(max_examples=60, deadline=None)
@given(expressions(), st.integers(0, 2**16))
def test_expression_matches_dense(expr, vec_seed):
    op, dense = expr
    got = np.asarray(op.todense())
    np.testing.assert_allclose(got, dense, rtol=2e-4, atol=2e-4)

    v = np.random.default_rng(vec_seed).normal(size=DIM).astype(np.float32)
    np.testing.assert_allclose(op @ v, dense @ v, rtol=2e-4, atol=2e-4)
    # numpy matmat == column-wise matvec
    M = np.random.default_rng(vec_seed + 1).normal(size=(DIM, 3)).astype(np.float32)
    np.testing.assert_allclose(op @ M, dense @ M, rtol=2e-4, atol=2e-4)
    # adjoint of the whole expression
    np.testing.assert_allclose(
        np.asarray(op.T.todense()), dense.T, rtol=2e-4, atol=2e-4
    )


@settings(max_examples=30, deadline=None)
@given(expressions())
def test_scipy_export_matches(expr):
    op, dense = expr
    A = op.to_scipy()
    v = np.random.default_rng(0).normal(size=DIM).astype(np.float32)
    np.testing.assert_allclose(A @ v, dense @ v, rtol=2e-4, atol=2e-4)
