"""Kronecker / eigh / block-diagonal / submatrix operators vs dense references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import (
    BlockDiagonalLinearOperator,
    EighDecomposedLinearOperator,
    KroneckerProductLinearOperator,
    MatrixLinearOperator,
    SubmatrixLinearOperator,
)

from tests.utils import compare_matmat, report_nonclose


def _spd(key, n):
    A = jax.random.normal(key, (n, n))
    return A @ A.T / n + jnp.eye(n)


class TestKronecker:
    def test_matmat_two_factors(self):
        k1, k2 = jax.random.split(jax.random.key(0))
        S1 = jax.random.normal(k1, (3, 4))
        S2 = jax.random.normal(k2, (2, 5))
        op = KroneckerProductLinearOperator(S1, S2)
        dense = np.kron(np.asarray(S1), np.asarray(S2))
        compare_matmat(op, dense)

    def test_matmat_three_factors(self):
        keys = jax.random.split(jax.random.key(1), 3)
        factors = [jax.random.normal(k, (n, n)) for k, n in zip(keys, (2, 3, 2))]
        op = KroneckerProductLinearOperator(*factors)
        dense = np.kron(np.kron(*[np.asarray(f) for f in factors[:2]]),
                        np.asarray(factors[2]))
        compare_matmat(op, dense)

    def test_properties(self):
        k1, k2 = jax.random.split(jax.random.key(2))
        S1, S2 = _spd(k1, 3), _spd(k2, 4)
        op = KroneckerProductLinearOperator(S1, S2)
        dense = np.kron(np.asarray(S1), np.asarray(S2))
        report_nonclose(op.trace(), np.trace(dense), rtol=1e-4)
        report_nonclose(op.det(), np.linalg.det(dense), rtol=1e-3)
        report_nonclose(op.logdet(), np.linalg.slogdet(dense)[1], rtol=1e-4)
        report_nonclose(op.frobenius_norm(), np.linalg.norm(dense), rtol=1e-4)

    @pytest.mark.parametrize(
        "mode",
        ["plain", "heuristic", "exact"],
    )
    def test_inverse_modes(self, mode):
        k1, k2 = jax.random.split(jax.random.key(3))
        S1, S2 = _spd(k1, 3), _spd(k2, 4)
        op = KroneckerProductLinearOperator(S1, S2)
        dense = np.kron(np.asarray(S1), np.asarray(S2))
        delta = 0.1
        inv = op.inverse(
            damping=delta,
            use_heuristic_damping=(mode == "heuristic"),
            use_exact_damping=(mode == "exact"),
        )
        v = np.random.default_rng(0).standard_normal(12).astype(np.float32)
        if mode == "exact":
            expected = np.linalg.solve(dense + delta * np.eye(12), v)
            report_nonclose(inv @ v, expected, rtol=5e-3, atol=1e-4)
        else:
            # factor-wise damping: (S1 + d1 I)^-1 (x) (S2 + d2 I)^-1
            if mode == "plain":
                d1 = d2 = delta
            else:
                pi = np.sqrt(
                    np.mean(np.diag(np.asarray(S2)))
                    / np.mean(np.diag(np.asarray(S1)))
                )
                d1, d2 = np.sqrt(delta) / pi, np.sqrt(delta) * pi
            expected = np.kron(
                np.linalg.inv(np.asarray(S1) + d1 * np.eye(3)),
                np.linalg.inv(np.asarray(S2) + d2 * np.eye(4)),
            ) @ v
            report_nonclose(inv @ v, expected, rtol=5e-3, atol=1e-4)

    def test_inverse_conflicting_damping_raises(self):
        op = KroneckerProductLinearOperator(jnp.eye(2), jnp.eye(2))
        with pytest.raises(ValueError):
            op.inverse(use_heuristic_damping=True, use_exact_damping=True)


class TestEigh:
    def test_dense_q(self):
        A = _spd(jax.random.key(4), 6)
        evals, evecs = jnp.linalg.eigh(A)
        op = EighDecomposedLinearOperator(evals, evecs)
        compare_matmat(op, np.asarray(A), rtol=1e-4, atol=1e-5)
        report_nonclose(op.trace(), np.trace(np.asarray(A)), rtol=1e-4)
        report_nonclose(op.logdet(), np.linalg.slogdet(np.asarray(A))[1], rtol=1e-4)
        report_nonclose(op.frobenius_norm(), np.linalg.norm(np.asarray(A)), rtol=1e-4)

        inv = op.inverse(damping=0.5)
        dense_inv = np.linalg.inv(np.asarray(A) + 0.5 * np.eye(6))
        v = np.random.default_rng(1).standard_normal(6).astype(np.float32)
        report_nonclose(inv @ v, dense_inv @ v, rtol=1e-4, atol=1e-5)

    def test_kronecker_q(self):
        """EKFAC-style: Q is a Kronecker product of eigenvector bases."""
        k1, k2 = jax.random.split(jax.random.key(5))
        A1, A2 = _spd(k1, 2), _spd(k2, 3)
        ev1, Q1 = jnp.linalg.eigh(A1)
        ev2, Q2 = jnp.linalg.eigh(A2)
        lam = jnp.kron(ev1, ev2)
        Q = KroneckerProductLinearOperator(Q1, Q2)
        op = EighDecomposedLinearOperator(lam, Q)
        dense = np.kron(np.asarray(A1), np.asarray(A2))
        compare_matmat(op, dense, rtol=1e-4, atol=1e-5)

    def test_settable_eigenvalues(self):
        A = _spd(jax.random.key(6), 4)
        evals, evecs = jnp.linalg.eigh(A)
        op = EighDecomposedLinearOperator(evals, evecs)
        op.eigenvalues = evals + 1.0
        dense = np.asarray(A) + np.asarray(evecs @ evecs.T)
        v = np.random.default_rng(2).standard_normal(4).astype(np.float32)
        report_nonclose(op @ v, dense @ v, rtol=1e-4, atol=1e-5)
        with pytest.raises(ValueError):
            op.eigenvalues = jnp.ones(5)


class TestBlockDiagonal:
    def test_matmat_and_properties(self):
        k1, k2 = jax.random.split(jax.random.key(7))
        S1, S2 = _spd(k1, 3), _spd(k2, 2)
        B1 = KroneckerProductLinearOperator(S1, S2)  # 6x6
        B2 = KroneckerProductLinearOperator(_spd(jax.random.key(8), 4))  # 4x4
        op = BlockDiagonalLinearOperator([B1, B2])
        d1, d2 = np.asarray(B1.todense()), np.asarray(B2.todense())
        dense = np.block(
            [[d1, np.zeros((6, 4))], [np.zeros((4, 6)), d2]]
        ).astype(np.float32)
        compare_matmat(op, dense, rtol=1e-4, atol=1e-5)
        report_nonclose(op.trace(), np.trace(dense), rtol=1e-4)
        report_nonclose(op.logdet(), np.linalg.slogdet(dense)[1], rtol=1e-4)
        report_nonclose(op.frobenius_norm(), np.linalg.norm(dense), rtol=1e-4)
        report_nonclose(op.det(), np.linalg.det(dense), rtol=1e-3)

        inv = op.inverse(damping=0.3)
        v = np.random.default_rng(3).standard_normal(10).astype(np.float32)
        expected = np.linalg.inv(
            np.block(
                [
                    [
                        np.kron(
                            np.asarray(S1) + 0.3 * np.eye(3), np.eye(2)
                        ) * 0 + np.kron(
                            np.linalg.inv(np.asarray(S1) + 0.3 * np.eye(3)),
                            np.linalg.inv(np.asarray(S2) + 0.3 * np.eye(2)),
                        ),
                        np.zeros((6, 4)),
                    ],
                    [np.zeros((4, 6)), np.linalg.inv(d2 + 0.3 * np.eye(4))],
                ]
            )
        )
        # inverse of blockdiag == blockdiag of (factor-damped) inverses
        blk = np.block(
            [
                [
                    np.kron(
                        np.linalg.inv(np.asarray(S1) + 0.3 * np.eye(3)),
                        np.linalg.inv(np.asarray(S2) + 0.3 * np.eye(2)),
                    ),
                    np.zeros((6, 4)),
                ],
                [np.zeros((4, 6)), np.linalg.inv(d2 + 0.3 * np.eye(4))],
            ]
        )
        report_nonclose(inv @ v, blk @ v, rtol=5e-3, atol=1e-4)


class TestSubmatrix:
    def test_matmat_and_adjoint(self):
        A = jax.random.normal(jax.random.key(9), (7, 5))
        op = SubmatrixLinearOperator(
            MatrixLinearOperator(A), [0, 2, 6], [1, 3, 4]
        )
        dense = np.asarray(A)[np.ix_([0, 2, 6], [1, 3, 4])]
        compare_matmat(op, dense, rtol=1e-5, atol=1e-6)

    def test_validation(self):
        A = MatrixLinearOperator(jnp.eye(4))
        with pytest.raises(ValueError):
            SubmatrixLinearOperator(A, [0, 0], [1])  # duplicates
        with pytest.raises(ValueError):
            SubmatrixLinearOperator(A, [0, 9], [1])  # out of range
        with pytest.raises(ValueError):
            SubmatrixLinearOperator(A, [0.5], [1])  # non-integer


class TestStackedKronecker:
    """Direct oracle for the batched stacked Kronecker contraction."""

    @pytest.mark.parametrize("dims", [[(3,)], [(3, 4)], [(2, 3, 2)]],
                             ids=["k1", "k2", "k3"])
    def test_matches_blockdiag_of_dense_krons(self, dims):
        from curvlinops_tpu.ops.stacked import StackedKroneckerOperator

        L = 3
        keys = jax.random.split(jax.random.key(11), len(dims[0]))
        factors = [
            jax.random.normal(k, (L, n, n))
            for k, n in zip(keys, dims[0])
        ]
        op = StackedKroneckerOperator(*factors)
        blocks = []
        for l in range(L):
            dense = np.asarray(factors[0][l])
            for S in factors[1:]:
                dense = np.kron(dense, np.asarray(S[l]))
            blocks.append(dense)
        full = np.zeros((op.shape[0], op.shape[1]), np.float32)
        off = 0
        for b in blocks:
            full[off:off + b.shape[0], off:off + b.shape[1]] = b
            off += b.shape[0]
        compare_matmat(op, full, rtol=1e-4, atol=1e-5)

    def test_adjoint_and_trace(self):
        from curvlinops_tpu.ops.stacked import StackedKroneckerOperator

        A = jax.random.normal(jax.random.key(0), (2, 3, 3))
        B = jax.random.normal(jax.random.key(1), (2, 4, 4))
        op = StackedKroneckerOperator(A, B)
        v = np.random.default_rng(0).standard_normal(op.shape[0]).astype("f")
        w = np.random.default_rng(1).standard_normal(op.shape[0]).astype("f")
        # <w, A v> == <A^T w, v>
        lhs = float(np.dot(w, op @ v))
        rhs = float(np.dot(np.asarray(op.adjoint() @ w), v))
        assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs))
        tr = sum(
            float(np.trace(np.kron(np.asarray(A[l]), np.asarray(B[l]))))
            for l in range(2)
        )
        assert abs(float(op.trace()) - tr) < 1e-4 * abs(tr)


def test_kronecker_logdet_nan_for_negative_det_factor():
    """torch.logdet semantics (reference kronecker.py:226): a factor with
    negative determinant yields NaN, never a plausible log|det|."""
    import curvlinops_tpu as cl

    neg = jnp.diag(jnp.asarray([-1.0, 2.0]))  # det < 0
    pos = jnp.diag(jnp.asarray([3.0, 4.0]))
    K = cl.KroneckerProductLinearOperator(neg, pos)
    assert bool(jnp.isnan(K.logdet()))
    K2 = cl.KroneckerProductLinearOperator(pos, pos)
    # logdet(A (x) B) = n_B logdet(A) + n_A logdet(B)
    expect = 4 * float(jnp.log(jnp.linalg.det(pos)))
    np.testing.assert_allclose(float(K2.logdet()), expect, rtol=1e-6)
