"""Empirical Fisher operator vs dense ground truth."""

import numpy as np
import pytest

from curvlinops_tpu import EFLinearOperator

from tests.cases import CASE_NAMES, make_case
from tests.utils import compare_matmat, dense_empirical_fisher


@pytest.mark.parametrize("case_name", CASE_NAMES)
def test_ef_matmat(case_name):
    case = make_case(case_name)
    op = EFLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        batch_size_fn=case.get("batch_size_fn"),
    )
    dense = dense_empirical_fisher(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        case.get("batch_size_fn"),
    )
    compare_matmat(op, dense, rtol=2e-4, atol=5e-6)


def test_ef_rejects_unsupported_loss():
    case = make_case("mlp_mse_mean")

    class WeirdLoss:
        reduction = "mean"

        def __call__(self, pred, y):
            return ((pred - y) ** 4).mean()

    with pytest.raises(NotImplementedError):
        op = EFLinearOperator(
            case["model_fn"],
            WeirdLoss(),
            case["params"],
            case["data"],
            check_deterministic=False,
        )
        op @ np.zeros(op.shape[1], dtype=np.float32)
