"""GGN diagonal operator vs the diagonal of the dense GGN."""

import numpy as np
import pytest

from curvlinops_tpu import GGNDiagonalLinearOperator

from tests.cases import make_case
from tests.utils import dense_ggn, report_nonclose

CASES = ["mlp_mse_mean", "mlp_mse_sum", "mlp_ce_mean", "mlp_bce_mean", "seq_ce_mean"]


@pytest.mark.parametrize("case_name", CASES)
def test_ggn_diagonal_exact(case_name):
    case = make_case(case_name)
    dense = dense_ggn(case["model_fn"], case["loss_fn"], case["params"], case["data"])
    op = GGNDiagonalLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"]
    )
    report_nonclose(op.todense(), np.diag(np.diag(dense)), rtol=2e-4, atol=5e-6)


def test_ggn_diagonal_mc_expectation():
    case = make_case("mlp_mse_mean")
    dense = dense_ggn(case["model_fn"], case["loss_fn"], case["params"], case["data"])
    op = GGNDiagonalLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        mc_samples=5000,
        check_deterministic=False,
    )
    import jax

    diag = np.concatenate(
        [np.asarray(d).ravel() for d in jax.tree.leaves(op.diagonal)]
    )
    ref = np.diag(dense)
    assert np.abs(diag - ref).max() / max(np.abs(ref).max(), 1e-3) < 0.12
