"""Tests for the LinearOperator core: formats, algebra, adjoint, chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import (
    ChainLinearOperator,
    DiagonalLinearOperator,
    IdentityLinearOperator,
    MatrixLinearOperator,
    OuterProductLinearOperator,
    PytreeLinearOperator,
)
from curvlinops_tpu.utils.flatten import spec_of

from tests.utils import compare_matmat, report_nonclose


def random_matrix_op(key, m, n):
    A = jax.random.normal(key, (m, n))
    return MatrixLinearOperator(A), np.asarray(A)


def test_matrix_operator_formats():
    op, A = random_matrix_op(jax.random.key(0), 7, 5)
    compare_matmat(op, A)


def test_identity():
    spec = spec_of({"a": jnp.zeros((3, 2)), "b": jnp.zeros(4)})
    op = IdentityLinearOperator(spec)
    compare_matmat(op, np.eye(10, dtype=np.float32))


def test_outer_product():
    U = jax.random.normal(jax.random.key(1), (6, 2))
    op = OuterProductLinearOperator(U, c=0.5)
    dense = 0.5 * np.asarray(U @ U.T)
    compare_matmat(op, dense)


def test_diagonal_operator():
    d = {"w": jnp.arange(1.0, 7.0).reshape(2, 3), "b": jnp.array([2.0, 3.0])}
    op = DiagonalLinearOperator(d)
    dense = np.diag(np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(d)]))
    compare_matmat(op, dense)

    # closure under algebra
    both = op + op
    assert isinstance(both, DiagonalLinearOperator)
    report_nonclose(both.todense(), 2 * dense)
    prod = op @ op
    assert isinstance(prod, DiagonalLinearOperator)
    report_nonclose(prod.todense(), dense @ dense)
    scaled = 3.0 * op
    assert isinstance(scaled, DiagonalLinearOperator)

    # damped inverse
    inv = op.inverse(damping=0.5)
    report_nonclose(inv.todense(), np.linalg.inv(dense + 0.5 * np.eye(8)))

    # closed-form properties
    report_nonclose(op.trace(), np.trace(dense))
    report_nonclose(op.logdet(), np.linalg.slogdet(dense)[1], rtol=1e-5)
    report_nonclose(op.frobenius_norm(), np.linalg.norm(dense), rtol=1e-5)


def test_algebra_sum_scale_sub_neg():
    k1, k2 = jax.random.split(jax.random.key(2))
    op1, A1 = random_matrix_op(k1, 5, 5)
    op2, A2 = random_matrix_op(k2, 5, 5)

    compare_matmat(op1 + op2, A1 + A2)
    compare_matmat(op1 - op2, A1 - A2)
    compare_matmat(2.5 * op1, 2.5 * A1)
    compare_matmat(op1 * 2.5, 2.5 * A1)
    compare_matmat(op1 / 2.0, A1 / 2.0)
    compare_matmat(-op1, -A1)
    compare_matmat((op1 + op2).adjoint(), (A1 + A2).T)


def test_chain():
    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    op1, A1 = random_matrix_op(k1, 4, 6)
    op2, A2 = random_matrix_op(k2, 6, 3)
    op3, A3 = random_matrix_op(k3, 3, 5)

    chain = op1 @ op2 @ op3
    assert isinstance(chain, ChainLinearOperator)
    assert len(chain) == 3  # nested chains flatten
    compare_matmat(chain, A1 @ A2 @ A3)
    compare_matmat(chain.adjoint(), (A1 @ A2 @ A3).T)

    # element replacement with shape validation
    op2b, A2b = random_matrix_op(jax.random.key(4), 6, 3)
    chain[1] = op2b
    compare_matmat(chain, A1 @ A2b @ A3)
    with pytest.raises(ValueError):
        chain[1] = op1

    # incompatible chains refuse
    with pytest.raises(ValueError):
        _ = op2 @ op1


def test_pytree_operator_auto_adjoint():
    spec = spec_of({"x": jnp.zeros(3), "y": jnp.zeros((2, 2))})

    def matvec(v):
        return {
            "x": 2.0 * v["x"] + v["y"].sum() * jnp.ones(3),
            "y": v["y"] * 3.0 + v["x"][0] * jnp.ones((2, 2)),
        }

    op = PytreeLinearOperator(matvec, spec)
    dense = np.asarray(op.todense())
    compare_matmat(op, dense)
    report_nonclose(op.adjoint().todense(), dense.T)


def test_scipy_export():
    op, A = random_matrix_op(jax.random.key(5), 6, 4)
    sp = op.to_scipy()
    x = np.random.default_rng(0).standard_normal(4).astype(np.float32)
    report_nonclose(sp @ x, A @ x, rtol=1e-5)
    report_nonclose(sp.rmatvec(A @ x), A.T @ (A @ x), rtol=1e-4, atol=1e-5)


def test_shape_mismatch_raises():
    op1, _ = random_matrix_op(jax.random.key(6), 4, 3)
    op2, _ = random_matrix_op(jax.random.key(7), 5, 3)
    with pytest.raises(ValueError):
        _ = op1 + op2
    with pytest.raises(ValueError):
        op1 @ np.ones(7)


def test_scalar_multiply_rejects_arrays():
    """Non-0d 'scalars' would broadcast against the column axis — refuse."""
    op = MatrixLinearOperator(jnp.eye(4))
    assert np.allclose((jnp.float32(2.0) * op) @ np.ones(4), 2 * np.ones(4))
    with pytest.raises(ValueError, match="scalar"):
        jnp.asarray([1.0, 2.0]) * op
    with pytest.raises(ValueError, match="scalar"):
        op / np.asarray([1.0, 2.0])


def test_rank1_spec_flat_input_returns_flat():
    """A bare array against a single rank-1 leaf spec is ambiguous between
    tree and flat; the result must come back FLAT (the array-at-the-edge
    contract) — e.g. J^T of a scalar-output model."""
    import curvlinops_tpu as cl

    params = {"W": jnp.ones((3, 2)) * 0.5, "b": jnp.zeros(2)}

    def model(p, x):  # [N, 3] -> [N] scalar outputs... keep [N, 1] -> [N]
        return (x @ p["W"] + p["b"]).sum(-1)

    X = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)
    JT = cl.TransposedJacobianLinearOperator(model, params, [(X, None)])
    w = np.ones(4, dtype=np.float32)
    out = JT @ w
    assert isinstance(out, np.ndarray) and out.shape == (JT.shape[0],)
    W = np.eye(4, dtype=np.float32)[:, :2]
    outM = JT @ jnp.asarray(W)
    assert hasattr(outM, "shape") and outM.shape == (JT.shape[0], 2)
    dense = JT.todense()  # crashed before the flat classification fix
    assert dense.shape == tuple(JT.shape)


def test_complex_scale_adjoint():
    """Complex scalars (incl. 0-d arrays) must break SELF_ADJOINT and be
    conjugated in the adjoint: (iA)^H = -i A^H."""
    A = MatrixLinearOperator(jnp.eye(3))
    A.SELF_ADJOINT = True
    B = jnp.asarray(1j) * A
    assert not B.SELF_ADJOINT
    np.testing.assert_allclose(
        np.asarray(B.T.todense()), -1j * np.eye(3), atol=1e-7
    )


def test_rmatmul_complex_vector():
    """v @ A must equal A^T v (not A^H v) for complex v."""
    mat = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, 3))
        + 1j * np.random.default_rng(2).normal(size=(3, 3))
    )
    A = MatrixLinearOperator(mat)
    v = np.asarray([1 + 2j, 0.5 - 1j, 3.0], dtype=np.complex64)
    np.testing.assert_allclose(
        np.asarray(v @ A), np.asarray(v @ np.asarray(mat)), rtol=1e-5
    )


def test_sum_and_chain_refuse_structurally_different_spaces():
    """Flat-size-equal but structurally different operators must refuse at
    construction, not crash inside a later jit trace."""
    import curvlinops_tpu as cl

    spec = {"a": jax.ShapeDtypeStruct((2, 2), jnp.float32)}
    P = cl.DiagonalLinearOperator({"a": jnp.ones((2, 2))})
    F = MatrixLinearOperator(jnp.eye(4))
    with pytest.raises(ValueError, match="pytree structure"):
        P + F
    with pytest.raises(ValueError, match="pytree structure"):
        P @ F
