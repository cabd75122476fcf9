"""Jacobian / transposed-Jacobian operators vs dense jax.jacobian."""

import numpy as np
import pytest

from curvlinops_tpu import JacobianLinearOperator, TransposedJacobianLinearOperator

from tests.cases import make_case
from tests.utils import compare_matmat, dense_jacobian

CASES = ["mlp_mse_mean", "mlp_ce_mean", "seq_ce_mean", "cnn_ce"]


@pytest.mark.parametrize("case_name", CASES)
def test_jacobian(case_name):
    case = make_case(case_name)
    dense = dense_jacobian(case["model_fn"], case["params"], case["data"])
    dense = dense.reshape(-1, dense.shape[-1])
    op = JacobianLinearOperator(case["model_fn"], case["params"], case["data"])
    assert op.shape == dense.shape
    compare_matmat(op, dense, rtol=2e-4, atol=5e-6)


@pytest.mark.parametrize("case_name", CASES)
def test_transposed_jacobian(case_name):
    case = make_case(case_name)
    dense = dense_jacobian(case["model_fn"], case["params"], case["data"])
    op = TransposedJacobianLinearOperator(
        case["model_fn"], case["params"], case["data"]
    )
    assert op.shape == (dense.shape[1], dense.shape[0])
    compare_matmat(op, dense.T, rtol=2e-4, atol=5e-6)
