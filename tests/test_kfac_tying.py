"""Weight-tying exactness oracles for (E)KFAC.

Mirrors the reference's tied-weight acceptance gates
(``test/test_kfac.py:199-356``, ``test/test_ekfac.py:195``):

- split-concat model (same ``W`` applied to two input halves), one datum,
  MSE + TYPE2 + EXPAND => (E)KFAC equals the block-diagonal GGN exactly
  (the two tied paths are independent, so expand over the tying axis is
  exact for N=1),
- mixed-bias tying (``W`` shared, bias on only one use) is exact under both
  separate and joint treatment (joint pads the bias column with 1/0 per use,
  ``kfac/computer.py:292-295``),
- conflicting biases (two distinct bias leaves on one tied weight) are
  refused under joint treatment (``kfac/computer.py:141-145``).

Models are plain pytree functions: tying in JAX is simply using the same
parameter leaf twice (reference builds module graphs to express this,
``test/utils.py:346-412``).
"""

import jax
import jax.numpy as jnp
import pytest

from curvlinops_tpu import FisherType, KFACType, MSELoss
from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.test_kfac import blockdiag_projection
from tests.utils import dense_ggn, report_nonclose

D = 4


def split_concat_fn(params, x):
    """Same ``W`` (and bias, if present) applied to both input halves."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    b = params.get("b", None)
    h1 = x1 @ params["W"] + (b if b is not None else 0.0)
    h2 = x2 @ params["W"] + (b if b is not None else 0.0)
    return jnp.concatenate([h1, h2], axis=-1)


def mixed_bias_fn(params, x):
    """Tied ``W``; the first use has a bias, the second does not."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 @ params["W"] + params["b"], x2 @ params["W"]], axis=-1)


def conflicting_bias_fn(params, x):
    """Tied ``W`` with two independent biases (one per use)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate(
        [x1 @ params["W"] + params["b1"], x2 @ params["W"] + params["b2"]], axis=-1
    )


def _one_datum(seed=0):
    key = jax.random.key(seed)
    kx, ky, kw, kb = jax.random.split(key, 4)
    X = jax.random.normal(kx, (1, 2 * D))
    y = jax.random.normal(ky, (1, 2 * D))
    W = jax.random.normal(kw, (D, D)) / jnp.sqrt(D)
    b = 0.1 * jax.random.normal(kb, (D,))
    return [(X, y)], W, b


def _assert_exact(linop_cls, model_fn, params, data, reduction, separate):
    op = linop_cls(
        model_fn,
        MSELoss(reduction),
        params,
        data,
        fisher_type=FisherType.TYPE2,
        kfac_approx=KFACType.EXPAND,
        separate_weight_and_bias=separate,
    )
    dense = dense_ggn(model_fn, MSELoss(reduction), params, data)
    expected = blockdiag_projection(dense, params, op.groups)
    report_nonclose(op.todense(), expected, rtol=5e-4, atol=1e-5, name="tied")


@pytest.mark.parametrize("linop_cls", [KFACLinearOperator, EKFACLinearOperator],
                         ids=["kfac", "ekfac"])
@pytest.mark.parametrize("separate", [True, False], ids=["separate", "joint"])
@pytest.mark.parametrize("bias", [False, True], ids=["no_bias", "with_bias"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_tying_type2_exact(linop_cls, reduction, bias, separate):
    """Tied-weight (E)KFAC-expand == block-diagonal GGN for one datum."""
    data, W, b = _one_datum()
    params = {"W": W, "b": b} if bias else {"W": W}
    _assert_exact(linop_cls, split_concat_fn, params, data, reduction, separate)


@pytest.mark.parametrize("linop_cls", [KFACLinearOperator, EKFACLinearOperator],
                         ids=["kfac", "ekfac"])
@pytest.mark.parametrize("separate", [True, False], ids=["separate", "joint"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_mixed_bias_tying_type2_exact(linop_cls, reduction, separate):
    """Tied ``W`` with bias on one use only: joint treatment pads 1/0."""
    data, W, b = _one_datum(seed=1)
    params = {"W": W, "b": b}
    _assert_exact(linop_cls, mixed_bias_fn, params, data, reduction, separate)


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_conflicting_biases_joint_refused(reduction):
    """Joint W+b treatment cannot merge two distinct biases on a tied weight."""
    data, W, b = _one_datum(seed=2)
    params = {"W": W, "b1": b, "b2": -b}
    with pytest.raises(ValueError, match="conflicting biases"):
        KFACLinearOperator(
            conflicting_bias_fn,
            MSELoss(reduction),
            params,
            data,
            fisher_type=FisherType.TYPE2,
            separate_weight_and_bias=False,
        )


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_conflicting_biases_separate_ok(reduction):
    """Separate treatment handles distinct biases on a tied weight exactly."""
    data, W, b = _one_datum(seed=3)
    params = {"W": W, "b1": b, "b2": -b}
    _assert_exact(
        KFACLinearOperator, conflicting_bias_fn, params, data, reduction, True
    )
