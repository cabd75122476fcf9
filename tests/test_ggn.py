"""GGN / MC-Fisher operator vs dense ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import GGNLinearOperator

from tests.cases import CASE_NAMES, make_case
from tests.utils import compare_matmat, dense_ggn, report_nonclose


@pytest.mark.parametrize("case_name", CASE_NAMES)
def test_ggn_matmat(case_name):
    case = make_case(case_name)
    op = GGNLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        batch_size_fn=case.get("batch_size_fn"),
    )
    dense = dense_ggn(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        case.get("batch_size_fn"),
    )
    compare_matmat(op, dense, rtol=2e-4, atol=5e-6)


@pytest.mark.parametrize("case_name", ["mlp_mse_mean", "mlp_ce_mean", "mlp_bce_mean"])
def test_ggn_mc_converges_to_exact(case_name):
    """MC Fisher with many samples approximates the exact GGN (expectation test)."""
    case = make_case(case_name)
    dense = dense_ggn(
        case["model_fn"], case["loss_fn"], case["params"], case["data"]
    )
    op = GGNLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        mc_samples=5000,
        check_deterministic=False,
    )
    rng = np.random.default_rng(0)
    v = rng.standard_normal(op.shape[1]).astype(np.float32)
    scale = max(np.abs(dense @ v).max(), 1e-2)
    assert np.abs(np.asarray(op @ v) - dense @ v).max() / scale < 0.12


def test_ggn_mc_deterministic_across_matvecs():
    """The same seed must give identical MC samples on every matvec."""
    case = make_case("mlp_mse_mean")
    op = GGNLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        mc_samples=1,
        check_deterministic=False,
    )
    rng = np.random.default_rng(1)
    v = rng.standard_normal(op.shape[1]).astype(np.float32)
    report_nonclose(op @ v, op @ v, rtol=1e-6, atol=1e-7, name="mc matvecs")

    # a different seed gives different samples
    op2 = GGNLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        mc_samples=1,
        seed=123,
        check_deterministic=False,
    )
    assert not np.allclose(np.asarray(op @ v), np.asarray(op2 @ v))
