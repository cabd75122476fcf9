"""KFAC for ``lax.cond``-gated layers (lowered to select with gated factors).

A layer inside a cond branch contributes its normal Kronecker factors when
the branch is taken and an exactly-zero Fisher block when it is not — the
Fisher's own semantics for a layer that did not run. Ambiguous cases
(cross-branch tying, embeddings in branches, parameter-derived predicates,
cond/scan nesting) remain refusals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import FisherType, MSELoss
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.cases import _mlp_params
from tests.test_kfac import blockdiag_projection, linear_mlp_fn
from tests.utils import dense_ggn, report_nonclose


def _case(seed=0, sizes=(4, 3, 2), N=8):
    key = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = _mlp_params(k1, list(sizes))
    X = jax.random.normal(k2, (N, sizes[0]))
    y = jax.random.normal(k3, (N, sizes[-1]))
    return params, X, y


def _gated_linear_fn(threshold):
    """Deep linear net whose middle layer is cond-gated on a data statistic."""

    def fn(params, x):
        l0 = params["layer0"]
        x = x @ l0["W"] + l0["b"]
        pred = jnp.sum(x) > threshold

        def taken(h):
            l1 = params["layer1"]
            return h @ l1["W"] + l1["b"]

        def skipped(h):
            l1 = params["layer1"]
            return jnp.zeros(h.shape[:-1] + (l1["W"].shape[1],), h.dtype)

        return jax.lax.cond(pred, taken, skipped, x)

    return fn


def test_cond_taken_branch_exact_deep_linear():
    """Predicate true for the data: KFAC == block-diagonal GGN exactly."""
    params, X, y = _case()
    fn = _gated_linear_fn(threshold=-1e9)  # always taken
    data = [(X, y)]
    kfac = KFACLinearOperator(
        fn, MSELoss("mean"), params, data, fisher_type=FisherType.TYPE2
    )
    dense = dense_ggn(fn, MSELoss("mean"), params, data)
    expected = blockdiag_projection(dense, params, kfac.groups)
    report_nonclose(kfac.todense(), expected, rtol=5e-4, atol=1e-5, name="kfac")


def test_cond_taken_matches_plain_model():
    """With the gate always taken, factors equal the ungated model's."""
    params, X, y = _case()
    fn = _gated_linear_fn(threshold=-1e9)
    kfac_gated = KFACLinearOperator(
        fn, MSELoss("mean"), params, [(X, y)], fisher_type=FisherType.TYPE2
    )
    kfac_plain = KFACLinearOperator(
        linear_mlp_fn, MSELoss("mean"), params, [(X, y)],
        fisher_type=FisherType.TYPE2,
    )
    np.testing.assert_allclose(
        np.asarray(kfac_gated.todense()),
        np.asarray(kfac_plain.todense()),
        rtol=1e-5,
        atol=1e-6,
    )


def test_cond_untaken_branch_zero_block():
    """Predicate false: the gated layer's KFAC block is exactly zero."""
    params, X, y = _case()
    fn = _gated_linear_fn(threshold=1e9)  # never taken
    kfac = KFACLinearOperator(
        fn, MSELoss("mean"), params, [(X, y)], fisher_type=FisherType.TYPE2,
        check_deterministic=False,
    )
    dense = np.asarray(kfac.todense())
    # layer1's rows/cols must vanish; layer0's block must match the plain GGN
    from tests.test_kfac import _leaf_ranges

    ranges = _leaf_ranges(params)
    for leaf in ("W", "b"):
        lo, hi = ranges[ranges_key(params, "layer1", leaf)]
        assert np.abs(dense[lo:hi]).max() == 0.0
        assert np.abs(dense[:, lo:hi]).max() == 0.0
    expected = dense_ggn(fn, MSELoss("mean"), params, [(X, y)])
    expected = blockdiag_projection(expected, params, kfac.groups)
    report_nonclose(dense, expected, rtol=5e-4, atol=1e-5, name="kfac")


def ranges_key(params, layer, leaf):
    """The flatten-with-path key tuple for params[layer][leaf]."""
    from jax.tree_util import tree_flatten_with_path

    for path, _ in tree_flatten_with_path(params)[0]:
        if getattr(path[0], "key", None) == layer and getattr(
            path[1], "key", None
        ) == leaf:
            return tuple(path)
    raise KeyError((layer, leaf))


def test_cond_both_branches_distinct_weights():
    """Different weights per branch: each gets gated factors, sum is exact."""
    key = jax.random.key(5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "Wa": 0.5 * jax.random.normal(k1, (4, 2)),
        "Wb": 0.5 * jax.random.normal(k2, (4, 2)),
    }
    X = jax.random.normal(k3, (6, 4))
    y = jax.random.normal(k4, (6, 2))

    def fn(p, x):
        pred = jnp.sum(x) > -1e9  # branch a taken

        def a(h):
            return h @ p["Wa"]

        def b(h):
            return h @ p["Wb"]

        return jax.lax.cond(pred, a, b, x)

    kfac = KFACLinearOperator(
        fn, MSELoss("mean"), params, [(X, y)], fisher_type=FisherType.TYPE2,
        check_deterministic=False,
    )
    dense = dense_ggn(fn, MSELoss("mean"), params, [(X, y)])
    expected = blockdiag_projection(dense, params, kfac.groups)
    report_nonclose(kfac.todense(), expected, rtol=5e-4, atol=1e-5, name="kfac")


# --------------------------------------------------------------------- #
# refusals
# --------------------------------------------------------------------- #
def test_cond_tied_across_branches_refused():
    params = {"W": jnp.ones((3, 3))}

    def fn(p, x):
        return jax.lax.cond(
            jnp.sum(x) > 0, lambda h: h @ p["W"], lambda h: 2.0 * (h @ p["W"]), x
        )

    with pytest.raises(ValueError, match="cond"):
        KFACLinearOperator(
            fn, MSELoss("mean"), params,
            [(jnp.ones((2, 3)), jnp.ones((2, 3)))],
            check_deterministic=False,
        )


def test_cond_param_predicate_refused():
    params = {"W": jnp.ones((3, 3))}

    def fn(p, x):
        return jax.lax.cond(
            jnp.sum(p["W"]) > 0, lambda h: 2.0 * h, lambda h: 3.0 * h, x @ p["W"]
        )

    with pytest.raises(ValueError, match="cond|unsupported"):
        KFACLinearOperator(
            fn, MSELoss("mean"), params,
            [(jnp.ones((2, 3)), jnp.ones((2, 3)))],
            check_deterministic=False,
        )


def test_cond_param_flows_out_refused():
    params = {"W": jnp.ones((3, 3))}

    def fn(p, x):
        W = jax.lax.cond(
            jnp.sum(x) > 0, lambda w: w, lambda w: 2.0 * w, p["W"]
        )
        return x @ W

    with pytest.raises(ValueError, match="cond"):
        KFACLinearOperator(
            fn, MSELoss("mean"), params,
            [(jnp.ones((2, 3)), jnp.ones((2, 3)))],
            check_deterministic=False,
        )


def test_cond_inside_scan_refused():
    params = {"W": jnp.ones((3, 3))}

    def fn(p, x):
        def body(h, _):
            h = jax.lax.cond(
                jnp.sum(h) > 0, lambda v: v @ p["W"], lambda v: v, h
            )
            return h, None

        out, _ = jax.lax.scan(body, x, None, length=2)
        return out

    with pytest.raises(ValueError, match="cond|scan"):
        KFACLinearOperator(
            fn, MSELoss("mean"), params,
            [(jnp.ones((2, 3)), jnp.ones((2, 3)))],
            check_deterministic=False,
        )


def test_cond_embedding_refused():
    params = {"E": jnp.ones((5, 3))}

    def fn(p, idx):
        return jax.lax.cond(
            jnp.sum(idx) > 0,
            lambda i: p["E"][i].reshape(i.shape[0], -1),
            lambda i: jnp.zeros((i.shape[0], 3)),
            idx,
        )

    with pytest.raises(ValueError, match="cond|embedding|unsupported"):
        KFACLinearOperator(
            fn,
            MSELoss("mean"),
            params,
            [(jnp.array([1, 2]), jnp.ones((2, 3)))],
            check_deterministic=False,
        )
