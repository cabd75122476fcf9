"""CG / LSMR / Neumann inverse operators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import (
    CGInverseLinearOperator,
    DiagonalLinearOperator,
    GGNLinearOperator,
    IdentityLinearOperator,
    LSMRInverseLinearOperator,
    MatrixLinearOperator,
    NeumannInverseLinearOperator,
)

from tests.cases import make_case
from tests.utils import dense_ggn, report_nonclose


def _spd_op(key, n):
    A = jax.random.normal(key, (n, n))
    M = A @ A.T / n + jnp.eye(n)
    return MatrixLinearOperator(M), np.asarray(M)


def test_cg_inverse_dense():
    op, dense = _spd_op(jax.random.key(0), 8)
    inv = CGInverseLinearOperator(op, maxiter=200, tol=1e-7)
    B = np.random.default_rng(0).standard_normal((8, 3)).astype(np.float32)
    report_nonclose(inv @ B, np.linalg.solve(dense, B), rtol=1e-3, atol=1e-4)
    assert inv.last_info is not None and int(inv.last_info["iterations"]) <= 200


def test_cg_inverse_with_preconditioner():
    op, dense = _spd_op(jax.random.key(1), 10)
    precond = DiagonalLinearOperator(1.0 / jnp.diag(jnp.asarray(dense)))
    # precondition on the flat space: wrap diag into a flat operator
    inv = CGInverseLinearOperator(op, maxiter=200, tol=1e-7, preconditioner=precond)
    b = np.random.default_rng(1).standard_normal(10).astype(np.float32)
    report_nonclose(inv @ b, np.linalg.solve(dense, b), rtol=1e-3, atol=1e-4)


def test_cg_inverse_of_curvature_operator():
    """The whole damped-GGN CG solve runs through the data-loop matmat."""
    case = make_case("mlp_mse_mean")
    G = GGNLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"]
    )
    delta = 0.1
    damped = G + delta * IdentityLinearOperator(G.in_spec)
    inv = CGInverseLinearOperator(damped, maxiter=500, tol=1e-7)
    dense = dense_ggn(
        case["model_fn"], case["loss_fn"], case["params"], case["data"]
    ) + delta * np.eye(G.shape[0])
    b = np.random.default_rng(2).standard_normal(G.shape[0]).astype(np.float32)
    report_nonclose(inv @ b, np.linalg.solve(dense, b), rtol=2e-3, atol=1e-4)


def test_lsmr_least_squares():
    A = jax.random.normal(jax.random.key(2), (12, 5))
    op = MatrixLinearOperator(A)
    inv = LSMRInverseLinearOperator(op, maxiter=50)
    B = np.random.default_rng(3).standard_normal((12, 2)).astype(np.float32)
    expected = np.linalg.lstsq(np.asarray(A), B, rcond=None)[0]
    report_nonclose(inv @ B, expected, rtol=1e-3, atol=1e-4)
    assert inv.lsmr_info is not None


def test_lsmr_square_solve():
    op, dense = _spd_op(jax.random.key(3), 6)
    inv = LSMRInverseLinearOperator(op, maxiter=200, atol=1e-7, btol=1e-7)
    b = np.random.default_rng(4).standard_normal(6).astype(np.float32)
    report_nonclose(inv @ b, np.linalg.solve(dense, b), rtol=1e-3, atol=1e-4)


def test_neumann_inverse():
    # well-conditioned: eigenvalues near 1 so the series converges fast
    n = 6
    A = jnp.eye(n) + 0.1 * _spd_op(jax.random.key(4), n)[1] / 10
    op = MatrixLinearOperator(A)
    inv = NeumannInverseLinearOperator(op, num_terms=60, scale=1.0)
    b = np.random.default_rng(5).standard_normal(n).astype(np.float32)
    report_nonclose(inv @ b, np.linalg.solve(np.asarray(A), b), rtol=1e-4, atol=1e-5)


def test_neumann_divergence_raises():
    op = MatrixLinearOperator(5.0 * jnp.eye(4))  # ||I - A|| = 4 > 1 diverges
    inv = NeumannInverseLinearOperator(op, num_terms=200, scale=1.0)
    with pytest.raises(ValueError, match="diverged"):
        inv @ np.ones(4, dtype=np.float32)


def test_neumann_with_preconditioner():
    """Left-preconditioned Neumann converges where the plain series diverges."""
    d = jnp.asarray([5.0, 2.0, 0.5, 1.5])
    op = MatrixLinearOperator(jnp.diag(d))
    precond = DiagonalLinearOperator(1.0 / d)  # exact inverse as preconditioner
    inv = NeumannInverseLinearOperator(
        op, num_terms=30, scale=1.0, preconditioner=precond
    )
    b = np.random.default_rng(6).standard_normal(4).astype(np.float32)
    report_nonclose(inv @ b, b / np.asarray(d), rtol=1e-5, atol=1e-6)


def test_neumann_zero_terms_is_identity_scale():
    """num_terms=0 keeps only the k=0 term: scale * M (regression: the
    on-device NaN-flag path must not require at least one term)."""
    import curvlinops_tpu as cl

    A = cl.MatrixLinearOperator(jnp.eye(4) * 2.0)
    v = np.arange(4.0, dtype=np.float32)
    out = cl.NeumannInverseLinearOperator(A, num_terms=0, scale=0.25) @ v
    assert np.allclose(out, 0.25 * v)


def test_kfac_ekfac_exact_preconditioners_for_cg_and_neumann():
    """KFAC/EKFAC inverses as EXACT preconditioners on linear regression.

    For a single linear layer + MSE the GGN equals the Hessian and KFAC/EKFAC
    are exact, so their damped inverses solve the damped-GGN system outright:
    CG converges immediately and a 0-term preconditioned Neumann series is
    already exact (reference ``test/test_inverse.py:97-166``).
    """
    from curvlinops_tpu import FisherType, MSELoss
    from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator
    from curvlinops_tpu.kfac.operator import KFACLinearOperator

    key = jax.random.key(1234)
    kw_, kx, ky = jax.random.split(key, 3)
    params = {"lin": {"W": jax.random.normal(kw_, (3, 2)) / jnp.sqrt(3.0)}}

    def model_fn(p, x):
        return x @ p["lin"]["W"]

    loss_fn = MSELoss("mean")
    data = [(jax.random.normal(kx, (6, 3)), jax.random.normal(ky, (6, 2)))]
    delta = 1e-2

    dense = dense_ggn(model_fn, loss_fn, params, data)
    inv_naive = np.linalg.inv(dense + delta * np.eye(len(dense)))

    ggn = GGNLinearOperator(model_fn, loss_fn, params, data)
    damped = ggn + delta * IdentityLinearOperator(ggn.in_spec)

    kfac = KFACLinearOperator(
        model_fn, loss_fn, params, data, fisher_type=FisherType.TYPE2,
        check_deterministic=False,
    )
    ekfac = EKFACLinearOperator(
        model_fn, loss_fn, params, data, fisher_type=FisherType.TYPE2,
        check_deterministic=False,
    )
    inv_kfac = kfac.inverse(damping=delta, use_exact_damping=True)
    inv_ekfac = ekfac.inverse(damping=delta)

    # the preconditioners themselves are exact inverses here
    for name, pre in [("kfac", inv_kfac), ("ekfac", inv_ekfac)]:
        report_nonclose(pre.todense(), inv_naive, rtol=5e-4, atol=1e-5,
                        name=f"{name} inverse")

    for name, pre in [("kfac", inv_kfac), ("ekfac", inv_ekfac)]:
        cg = CGInverseLinearOperator(damped, tol=1e-8, preconditioner=pre)
        report_nonclose(cg.todense(), inv_naive, rtol=1e-4, atol=1e-5,
                        name=f"cg+{name}")
        neumann = NeumannInverseLinearOperator(
            damped, num_terms=0, preconditioner=pre
        )
        report_nonclose(neumann.todense(), inv_naive, rtol=1e-4, atol=1e-5,
                        name=f"neumann+{name}")


def test_lsmr_large_norm_operator_converges():
    """Stopping rule S1 uses the SOLUTION norm (Fong-Saunders): an operator
    with ||A|| >= 1/atol must not 'converge' at iteration 0 with X=0."""
    from curvlinops_tpu.solvers.lsmr import batched_lsmr

    A = 2e6 * jnp.eye(8)
    b = jnp.ones((8, 1))
    X, info = batched_lsmr(lambda v: A @ v, lambda v: A.T @ v, b, maxiter=50)
    assert int(info["iterations"]) >= 1
    np.testing.assert_allclose(np.asarray(X), np.asarray(b) / 2e6, rtol=1e-6)


def test_neumann_composes_under_trace():
    """Neumann with check_nan=True (the default) must be traceable — e.g. as
    a CG preconditioner, where its host-side NaN check cannot run."""
    P = NeumannInverseLinearOperator(
        MatrixLinearOperator(jnp.eye(6)), num_terms=5, scale=1.0
    )
    sym = MatrixLinearOperator(2.0 * jnp.eye(6))
    cg = CGInverseLinearOperator(sym, preconditioner=P, maxiter=50, tol=1e-10)
    v = np.ones(6, dtype=np.float32)
    np.testing.assert_allclose(cg @ v, v / 2.0, rtol=1e-5)


def test_minres_indefinite_dense():
    """MINRES solves symmetric INDEFINITE systems (where CG has no
    guarantee): the undamped-Hessian regime the reference cannot serve."""
    from curvlinops_tpu import MINRESInverseLinearOperator

    rng = np.random.default_rng(5)
    Q = np.linalg.qr(rng.normal(size=(24, 24)))[0]
    w = np.concatenate([np.linspace(-4, -0.5, 8), np.linspace(0.5, 6, 16)])
    dense = (Q * w) @ Q.T
    op = MatrixLinearOperator(jnp.asarray(dense, jnp.float32))
    op.SELF_ADJOINT = True  # assert symmetry of the wrapped matrix
    inv = MINRESInverseLinearOperator(op, maxiter=200, tol=1e-7)
    v = rng.normal(size=24).astype(np.float32)
    report_nonclose(
        inv @ v, np.linalg.solve(dense, v), rtol=1e-3, atol=1e-4,
        name="MINRES indefinite",
    )
    assert int(inv.last_info["iterations"]) <= 200
    # program cache reused across same-width solves
    x2 = inv @ (2 * v)
    np.testing.assert_allclose(x2, 2 * np.asarray(inv @ v), rtol=1e-3, atol=1e-4)
    assert len(inv._program_cache[1]) == 1


def test_minres_on_indefinite_hessian():
    """MINRES against a real (indefinite) neural-net Hessian."""
    from curvlinops_tpu import HessianLinearOperator, MINRESInverseLinearOperator
    from curvlinops_tpu.losses import MSELoss

    case = make_case("mlp_mse_mean")
    H = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        check_deterministic=False,
    )
    dense = np.asarray(H.todense())
    evals = np.linalg.eigvalsh(dense)
    shift = 0.0
    if evals.min() > -1e-4:  # make it genuinely indefinite for the test
        shift = float(evals.min()) + 0.1
        dense = dense - shift * np.eye(len(dense))
    A = H - shift * IdentityLinearOperator(H.in_spec)
    inv = MINRESInverseLinearOperator(A, maxiter=600, tol=1e-8)
    v = np.random.default_rng(6).normal(size=H.shape[0]).astype(np.float32)
    report_nonclose(
        inv @ v, np.linalg.solve(dense, v), rtol=5e-3, atol=1e-3,
        name="MINRES NN Hessian",
    )


def test_minres_requires_symmetric():
    from curvlinops_tpu import MINRESInverseLinearOperator

    A = MatrixLinearOperator(
        jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)), jnp.float32)
    )  # SELF_ADJOINT defaults to False for general matrices
    with pytest.raises(ValueError, match="symmetric"):
        MINRESInverseLinearOperator(A)
