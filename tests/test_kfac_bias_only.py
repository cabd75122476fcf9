"""Bias-only KFAC blocks (weights closed over in ``model_fn``).

Mirrors the reference's ``exclude='weight'`` configuration
(``kfac.py:322-335`` and the ``exclude`` axis of ``test_kfac.py``): when only
bias leaves are passed as params, each bias still gets its exact gradient-
covariance block — the weight's provenance is irrelevant to the bias block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import FisherType, KFACType, MSELoss
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.test_kfac import blockdiag_projection
from tests.utils import dense_ggn, report_nonclose


def _weights(seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    return (
        0.4 * jax.random.normal(k1, (5, 4)),
        0.4 * jax.random.normal(k2, (4, 3)),
    )


def _data(key, n_per_batch, d_in=5, d_out=3, share=()):
    batches = []
    for i, n in enumerate(n_per_batch):
        kx, ky = jax.random.split(jax.random.fold_in(key, i))
        X = jax.random.normal(kx, (n, *share, d_in))
        y = jax.random.normal(ky, (n, *share, d_out))
        batches.append((X, y))
    return batches


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_bias_only_matches_full_kfac_bias_blocks(reduction):
    """KFAC over biases alone == the bias blocks of separate-W+b full KFAC."""
    W1, W2 = _weights()
    kb1, kb2 = jax.random.split(jax.random.key(1))
    b1 = 0.2 * jax.random.normal(kb1, (4,))
    b2 = 0.2 * jax.random.normal(kb2, (3,))

    def model_full(p, x):
        h = jax.nn.relu(x @ p["l1"]["W"] + p["l1"]["b"])
        return h @ p["l2"]["W"] + p["l2"]["b"]

    def model_bias(p, x):
        h = jax.nn.relu(x @ W1 + p["b1"])
        return h @ W2 + p["b2"]

    data = _data(jax.random.key(2), [3, 6])
    full = KFACLinearOperator(
        model_full,
        MSELoss(reduction),
        {"l1": {"W": W1, "b": b1}, "l2": {"W": W2, "b": b2}},
        data,
        fisher_type=FisherType.TYPE2,
        separate_weight_and_bias=True,
        check_deterministic=False,
    ).todense()
    bias_only = KFACLinearOperator(
        model_bias,
        MSELoss(reduction),
        {"b1": b1, "b2": b2},
        data,
        fisher_type=FisherType.TYPE2,
        check_deterministic=False,
    ).todense()

    # full params flatten as l1.W (20), l1.b (4), l2.W (12), l2.b (3)
    # ("W" sorts before "b"); bias-only as b1 (4), b2 (3)
    idx = np.r_[20:24, 36:39]
    report_nonclose(
        bias_only, full[np.ix_(idx, idx)], rtol=1e-5, atol=1e-7,
        name="bias-only vs full bias blocks",
    )


@pytest.mark.parametrize("approx", [KFACType.EXPAND, KFACType.REDUCE])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_bias_only_linear_exact(reduction, approx):
    """Deep-linear + MSE: bias-only KFAC equals the GGN bias blocks exactly,
    including with a weight-sharing axis (reference exactness property)."""
    W1, W2 = _weights(seed=3)
    kb1, kb2 = jax.random.split(jax.random.key(4))
    b1 = 0.2 * jax.random.normal(kb1, (4,))
    b2 = 0.2 * jax.random.normal(kb2, (3,))

    def model(p, x):
        h = x @ W1 + p["b1"]
        if approx == KFACType.REDUCE:
            h = jnp.mean(h, axis=1, keepdims=True) + 0 * h[:, :1]
        return h @ W2 + p["b2"]

    share = (7,)
    data = _data(jax.random.key(5), [2, 5], share=share)
    if approx == KFACType.REDUCE:
        data = [(X, y[:, :1]) for X, y in data]
    params = {"b1": b1, "b2": b2}
    kfac = KFACLinearOperator(
        model,
        MSELoss(reduction),
        params,
        data,
        fisher_type=FisherType.TYPE2,
        kfac_approx=approx,
        check_deterministic=False,
    )
    dense = dense_ggn(model, MSELoss(reduction), params, data)
    expected = blockdiag_projection(dense, params, kfac.groups)
    report_nonclose(
        kfac.todense(), expected, rtol=5e-4, atol=1e-6, name="bias-only exact"
    )


def test_tied_bias_only_merges():
    """The same bias leaf added at two PARALLEL sites forms ONE merged group
    with tied (per-site sharing-axis) accumulation.

    Both sites are built to produce identical output gradients, so the tied
    block must be exactly 2x the block of the single-site surrogate (where
    the second site's bias is a closed-over constant) — pinning the per-site
    ``ggT`` accumulation convention (no cross-site terms), matching the
    reference's per-module-hook accumulation for tied parameters.
    """
    W1, _ = _weights(seed=6)
    b = 0.1 * jax.random.normal(jax.random.key(7), (4,))

    def tied(p, x):  # identical sites => identical per-site gradients
        z1 = x @ W1 + p["b"]
        z2 = x @ W1 + p["b"]
        return z1 + z2

    def single(p, x):  # site 2's bias closed over as a constant
        z1 = x @ W1 + p["b"]
        z2 = x @ W1 + b
        return z1 + z2

    data = [
        (jax.random.normal(jax.random.key(8), (4, 5)),
         jax.random.normal(jax.random.key(9), (4, 4)))
    ]
    kw = dict(fisher_type=FisherType.TYPE2, check_deterministic=False)
    k_tied = KFACLinearOperator(tied, MSELoss("mean"), {"b": b}, data, **kw)
    k_single = KFACLinearOperator(single, MSELoss("mean"), {"b": b}, data, **kw)
    assert len(k_tied.groups) == 1
    report_nonclose(
        k_tied.todense(), 2.0 * np.asarray(k_single.todense()),
        rtol=1e-5, atol=1e-7, name="tied bias block",
    )


def test_chained_bias_readd_refused():
    """Re-adding a bias-only block's bias along its own output chain is
    refused: only one gradient tap exists, so 'merging' would drop a site
    (the pre-fix code silently attached and miscomputed)."""
    W1, W2 = _weights(seed=6)
    b = 0.1 * jax.random.normal(jax.random.key(7), (4,))

    def model(p, x):
        h = x @ W1 + p["b"]
        return (h @ W2[:, :1] + (h + p["b"]) @ W2[:, 1:2]).sum(-1)

    data = [
        (jax.random.normal(jax.random.key(8), (4, 5)),
         jax.random.normal(jax.random.key(9), (4,)))
    ]
    with pytest.raises(ValueError, match="more than once"):
        KFACLinearOperator(
            model, MSELoss("mean"), {"b": b}, data,
            fisher_type=FisherType.TYPE2, check_deterministic=False,
        )


def test_bias_only_refusals():
    """Mis-shaped or reordered bias adds are refused, not miscomputed."""
    W1, _ = _weights(seed=10)
    data = [
        (jax.random.normal(jax.random.key(11), (3, 5)),
         jax.random.normal(jax.random.key(12), (3, 4)))
    ]

    def bad_shape(p, x):  # (3,)-leaf broadcast over batch, not features
        return (x @ W1) + p["b"][:, None]

    with pytest.raises(ValueError, match="bias with 3 elements"):
        KFACLinearOperator(
            bad_shape, MSELoss("mean"),
            {"b": jnp.ones(3)}, data,
            fisher_type=FisherType.TYPE2, check_deterministic=False,
        )


def test_bias_added_twice_to_same_layer_refused():
    """``x @ W + b + b`` must refuse — re-attaching the SAME bias silently
    modeled only one add (gradient off by 2x; collector fuzzer seed 44)."""
    data = [
        (jax.random.normal(jax.random.key(13), (3, 5)),
         jax.random.normal(jax.random.key(14), (3, 4)))
    ]

    def double_bias(p, x):
        return x @ p["W"] + p["b"] + p["b"]

    params = {"W": jnp.ones((5, 4)), "b": jnp.ones(4)}
    with pytest.raises(ValueError, match="more than once"):
        KFACLinearOperator(
            double_bias, MSELoss("mean"), params, data,
            fisher_type=FisherType.TYPE2, check_deterministic=False,
        )
