"""Hessian operator vs dense ``jax.hessian`` ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import HessianLinearOperator

from tests.cases import CASE_NAMES, make_case
from tests.utils import compare_matmat, dense_hessian, report_nonclose


@pytest.mark.parametrize("case_name", CASE_NAMES)
def test_hessian_matmat(case_name):
    case = make_case(case_name)
    op = HessianLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        batch_size_fn=case.get("batch_size_fn"),
    )
    dense = dense_hessian(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        case.get("batch_size_fn"),
    )
    compare_matmat(op, dense, rtol=2e-4, atol=5e-6)


def test_gradient_and_loss():
    case = make_case("mlp_mse_mean")
    op = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"]
    )
    grad, loss = op.gradient_and_loss()

    from tests.utils import total_loss_fn

    total = total_loss_fn(case["model_fn"], case["loss_fn"], case["data"])
    ref_loss, ref_grad = jax.value_and_grad(total)(case["params"])
    report_nonclose(loss, ref_loss, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grad), jax.tree.leaves(ref_grad)):
        report_nonclose(a, b, rtol=1e-5, atol=1e-6)


def test_nondeterministic_data_raises():
    """Shuffling data iterables must be caught by the determinism check."""
    case = make_case("mlp_mse_mean")

    class ShufflingData:
        def __init__(self, data):
            self.data = list(data)
            self.count = 0

        def __iter__(self):
            self.count += 1
            rng = np.random.default_rng(self.count)
            # different scaling every pass -> non-deterministic loss
            scale = 1.0 + 0.1 * self.count
            for X, y in self.data:
                yield scale * X, y

    with pytest.raises(RuntimeError):
        HessianLinearOperator(
            case["model_fn"],
            case["loss_fn"],
            case["params"],
            ShufflingData(case["data"]),
        )


def test_dict_input_without_batch_size_fn_ok():
    """Pytree inputs use the default first-leaf batch size unless overridden."""
    case = make_case("dict_mse")
    # works with explicit batch_size_fn
    op = HessianLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        case["data"],
        batch_size_fn=case["batch_size_fn"],
    )
    assert op.num_data == 8


def test_max_vmap_columns_chunking():
    """Chunked-column matmats equal full-vmap matmats (memory policy)."""
    case = make_case("mlp_mse_mean")
    full = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        check_deterministic=False,
    )
    chunked = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        max_vmap_columns=2, check_deterministic=False,
    )
    X = np.random.default_rng(3).standard_normal((full.shape[1], 5)).astype(np.float32)
    report_nonclose(chunked @ X, full @ X, rtol=1e-5, atol=1e-6)


def test_bfloat16_operator_roundtrip():
    """Operators work end-to-end with bfloat16 parameters (TPU-native dtype)."""
    import jax.numpy as jnp

    case = make_case("mlp_mse_mean")
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), case["params"])
    data = [
        (X.astype(jnp.bfloat16), y.astype(jnp.bfloat16)) for X, y in case["data"]
    ]
    op = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], params, data,
        check_deterministic=False,
    )
    assert op.dtype == jnp.bfloat16
    v = np.random.default_rng(4).standard_normal(op.shape[0]).astype(np.float32)
    out = op @ v  # numpy in -> numpy out, via bf16 compute
    assert out.dtype == np.float32 and np.isfinite(out).all()

    # rough agreement with the fp32 operator
    ref = HessianLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        check_deterministic=False,
    )
    ref_out = ref @ v
    scale = max(np.abs(ref_out).max(), 1e-3)
    assert np.abs(out - ref_out).max() / scale < 0.1
