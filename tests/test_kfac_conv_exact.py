"""Conv and multi-axis weight-sharing exactness oracles for KFAC.

Mirrors the reference's ``KFAC_WEIGHT_SHARING_EXACT_CASES``
(``test/kfac_cases.py:74-112``): for LINEAR models (a single conv layer, or
a conv followed by average pooling) KFAC-expand/-reduce with TYPE2 Fisher
equals the block-diagonal GGN exactly — the strongest end-to-end check of
the conv patch extraction, sharing-format scaling, and REDUCE averaging.
"""

import jax
import jax.numpy as jnp
import pytest

from curvlinops_tpu import FisherType, KFACType, MSELoss
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.test_kfac import blockdiag_projection
from tests.utils import dense_ggn, report_nonclose


def _conv_params(seed=0, bias=True):
    key = jax.random.key(seed)
    kw, kb = jax.random.split(key)
    p = {"W": 0.3 * jax.random.normal(kw, (4, 4, 3, 2))}  # HWIO
    if bias:
        p["b"] = 0.1 * jax.random.normal(kb, (2,))
    return p


def _conv_apply(p, x):
    z = jax.lax.conv_general_dilated(
        x, p["W"], (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return z + p["b"] if "b" in p else z


def conv_expand_model(p, x):  # [B, 8, 8, 3] -> [B, 9, 9, 2]
    return _conv_apply(p, x)


def conv_reduce_model(p, x):  # [B, 8, 8, 3] -> [B, 2]
    return jnp.mean(_conv_apply(p, x), axis=(1, 2))


def _data(key, n_per_batch, out_shape_fn):
    batches = []
    for i, n in enumerate(n_per_batch):
        kx, ky = jax.random.split(jax.random.fold_in(key, i))
        X = jax.random.normal(kx, (n, 8, 8, 3))
        y = jax.random.normal(ky, out_shape_fn(n))
        batches.append((X, y))
    return batches


@pytest.mark.parametrize("separate", [True, False], ids=["separate", "joint"])
@pytest.mark.parametrize("bias", [True, False], ids=["bias", "no_bias"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_conv_expand_exact(reduction, bias, separate):
    """Single conv layer + MSE on the spatial output: expand-KFAC is exact
    (reference ``kfac_cases.py:98-105`` EXPAND)."""
    params = _conv_params(bias=bias)
    data = _data(jax.random.key(1), [2, 7], lambda n: (n, 9, 9, 2))
    kfac = KFACLinearOperator(
        conv_expand_model, MSELoss(reduction), params, data,
        fisher_type=FisherType.TYPE2, kfac_approx=KFACType.EXPAND,
        separate_weight_and_bias=separate, check_deterministic=False,
    )
    dense = dense_ggn(conv_expand_model, MSELoss(reduction), params, data)
    expected = blockdiag_projection(dense, params, kfac.groups)
    report_nonclose(kfac.todense(), expected, rtol=2e-3, atol=2e-5,
                    name="conv expand")


@pytest.mark.parametrize("separate", [True, False], ids=["separate", "joint"])
@pytest.mark.parametrize("bias", [True, False], ids=["bias", "no_bias"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_conv_reduce_exact(reduction, bias, separate):
    """Conv + global average pooling: reduce-KFAC is exact
    (reference ``kfac_cases.py:98-110`` REDUCE)."""
    params = _conv_params(bias=bias)
    data = _data(jax.random.key(2), [1, 8], lambda n: (n, 2))
    kfac = KFACLinearOperator(
        conv_reduce_model, MSELoss(reduction), params, data,
        fisher_type=FisherType.TYPE2, kfac_approx=KFACType.REDUCE,
        separate_weight_and_bias=separate, check_deterministic=False,
    )
    dense = dense_ggn(conv_reduce_model, MSELoss(reduction), params, data)
    expected = blockdiag_projection(dense, params, kfac.groups)
    report_nonclose(kfac.todense(), expected, rtol=2e-3, atol=2e-5,
                    name="conv reduce")


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_two_sharing_dims_expand_exact(reduction):
    """Deep linear over TWO weight-sharing axes ([B, 4, 8, 5] inputs):
    expand-KFAC is exact (reference ``kfac_cases.py:79-97``)."""
    from tests.cases import _mlp_params

    params = _mlp_params(jax.random.key(3), [5, 4, 3])

    def model(p, x):
        for i in range(len(p)):
            x = x @ p[f"layer{i}"]["W"] + p[f"layer{i}"]["b"]
        return x

    def mk(n, i):
        kx, ky = jax.random.split(jax.random.fold_in(jax.random.key(4), i))
        return (jax.random.normal(kx, (n, 4, 8, 5)),
                jax.random.normal(ky, (n, 4, 8, 3)))

    data = [mk(2, 0), mk(7, 1)]
    kfac = KFACLinearOperator(
        model, MSELoss(reduction), params, data,
        fisher_type=FisherType.TYPE2, kfac_approx=KFACType.EXPAND,
        check_deterministic=False,
    )
    dense = dense_ggn(model, MSELoss(reduction), params, data)
    expected = blockdiag_projection(dense, params, kfac.groups)
    report_nonclose(kfac.todense(), expected, rtol=2e-3, atol=2e-5,
                    name="two sharing dims")
