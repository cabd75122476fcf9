"""Loss-Hessian square roots and samplers vs autodiff ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu.curvature.loss_hessian import (
    empirical_grad_output,
    loss_hessian_sqrt_columns,
    sample_grad_outputs,
)
from curvlinops_tpu.losses import BCEWithLogitsLoss, CrossEntropyLoss, MSELoss

from tests.utils import report_nonclose


def _datum_loss_hessian(loss_fn, output, target):
    """Hessian of the single-datum loss w.r.t. the flattened prediction."""

    def datum_loss(flat):
        return loss_fn(flat.reshape(output.shape)[None], target[None])

    return np.asarray(jax.hessian(datum_loss)(output.reshape(-1)))


LOSS_OUTPUT_CASES = [
    (MSELoss("mean"), (5,), "regression"),
    (MSELoss("sum"), (5,), "regression"),
    (BCEWithLogitsLoss("mean"), (4,), "binary"),
    (BCEWithLogitsLoss("sum"), (4,), "binary"),
    (CrossEntropyLoss("mean"), (3,), "class"),
    (CrossEntropyLoss("sum"), (3,), "class"),
    (CrossEntropyLoss("mean"), (3, 4), "class_seq"),  # sequence output [C, D]
    (CrossEntropyLoss("sum"), (3, 4), "class_seq"),
]


def _make_target(kind, shape, key):
    if kind == "regression":
        return jax.random.normal(key, shape)
    if kind == "binary":
        return jax.random.bernoulli(key, 0.5, shape).astype(jnp.float32)
    if kind == "class":
        return jax.random.randint(key, (), 0, shape[0])
    return jax.random.randint(key, shape[1:], 0, shape[0])  # class_seq


@pytest.mark.parametrize("loss_fn,shape,kind", LOSS_OUTPUT_CASES)
def test_sqrt_columns_factorize_hessian(loss_fn, shape, kind):
    output = jax.random.normal(jax.random.key(0), shape)
    target = _make_target(kind, shape, jax.random.key(1))

    S = loss_hessian_sqrt_columns(loss_fn, output, target)  # [V, *shape]
    S_flat = np.asarray(S.reshape(S.shape[0], -1))
    H = _datum_loss_hessian(loss_fn, output, target)
    report_nonclose(S_flat.T @ S_flat, H, rtol=1e-5, atol=1e-6, name="S^T S vs H")


@pytest.mark.parametrize("loss_fn,shape,kind", LOSS_OUTPUT_CASES)
def test_sampler_expectation_is_hessian(loss_fn, shape, kind):
    output = jax.random.normal(jax.random.key(2), shape)
    target = _make_target(kind, shape, jax.random.key(3))

    g = sample_grad_outputs(loss_fn, output, target, jax.random.key(4), 60000)
    g = np.asarray(g.reshape(g.shape[0], -1))
    emp = g.T @ g / g.shape[0]
    H = _datum_loss_hessian(loss_fn, output, target)
    scale = max(np.abs(H).max(), 1e-2)
    assert np.abs(emp - H).max() / scale < 0.08, (emp, H)


def test_empirical_grad_output_scaling():
    loss_fn = MSELoss("mean")
    output = jax.random.normal(jax.random.key(5), (4,))
    target = jax.random.normal(jax.random.key(6), (4,))
    g = empirical_grad_output(loss_fn, output, target)[0]
    # sqrt(C)-rescaled mean gradient: (2/C)(f - y) * sqrt(C)
    expected = 2 * (output - target) / jnp.sqrt(4.0)
    report_nonclose(g, expected, rtol=1e-6, atol=1e-7)
