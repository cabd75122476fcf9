"""KFAC over ``lax.scan``-stacked layer stacks (the idiomatic TPU transformer).

No reference counterpart exists (torch has no scan; the reference's FX
collector only sees unrolled graphs, ``computers/io_collector/collector.py``).
The oracles are therefore *internal consistency*: a scanned layer stack must
produce exactly the operator of the equivalent unrolled model (which IS
covered by the reference semantics and its exactness tests), and scanned deep
linear + MSE + TYPE2 must equal the block-diagonal GGN slice-by-slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import FisherType, MSELoss
from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.utils import dense_ggn, report_nonclose

L, D, B = 3, 4, 8


def scan_mlp(params, x):
    def body(h, wb):
        W, b = wb
        return h @ W + b, None

    h, _ = jax.lax.scan(body, x, (params["W"], params["b"]))
    return h


def unrolled_mlp(params, x):
    h = x
    for l in range(L):
        h = h @ params[f"W{l}"] + params[f"b{l}"]
    return h


def _case(seed=0):
    key = jax.random.key(seed)
    kW, kb, kx, ky = jax.random.split(key, 4)
    Ws = jax.random.normal(kW, (L, D, D)) * 0.3
    bs = jax.random.normal(kb, (L, D)) * 0.1
    X = jax.random.normal(kx, (B, D))
    y = jax.random.normal(ky, (B, D))
    data = list(zip(jnp.split(X, 2), jnp.split(y, 2)))
    params_scan = {"W": Ws, "b": bs}
    params_unroll = {}
    for l in range(L):
        params_unroll[f"W{l}"] = Ws[l]
        params_unroll[f"b{l}"] = bs[l]
    return params_scan, params_unroll, data


def _probe(seed=7):
    k1, k2 = jax.random.split(jax.random.key(seed))
    vt_s = {
        "W": jax.random.normal(k1, (L, D, D)),
        "b": jax.random.normal(k2, (L, D)),
    }
    vt_u = {}
    for l in range(L):
        vt_u[f"W{l}"] = vt_s["W"][l]
        vt_u[f"b{l}"] = vt_s["b"][l]
    return vt_s, vt_u


def _assert_slices_match(r_s, r_u, rtol=5e-4, atol=5e-5):
    for l in range(L):
        report_nonclose(r_s["W"][l], r_u[f"W{l}"], rtol, atol, name=f"W{l}")
        report_nonclose(r_s["b"][l], r_u[f"b{l}"], rtol, atol, name=f"b{l}")


@pytest.mark.parametrize("separate", [True, False], ids=["separate", "joint"])
@pytest.mark.parametrize(
    "fisher_type", [FisherType.TYPE2, FisherType.EMPIRICAL, FisherType.FORWARD_ONLY]
)
def test_scan_kfac_equals_unrolled(separate, fisher_type):
    """Scanned stack == unrolled model: matvec, trace, Frobenius norm."""
    params_scan, params_unroll, data = _case()
    loss = MSELoss("mean")
    op_s = KFACLinearOperator(
        scan_mlp, loss, params_scan, data,
        fisher_type=fisher_type, separate_weight_and_bias=separate,
    )
    op_u = KFACLinearOperator(
        unrolled_mlp, loss, params_unroll, data,
        fisher_type=fisher_type, separate_weight_and_bias=separate,
    )
    assert all(g.stack == L for g in op_s.groups)
    vt_s, vt_u = _probe()
    _assert_slices_match(op_s @ vt_s, op_u @ vt_u)
    np.testing.assert_allclose(op_s.trace(), op_u.trace(), rtol=1e-4)
    np.testing.assert_allclose(
        op_s.frobenius_norm(), op_u.frobenius_norm(), rtol=1e-4
    )


@pytest.mark.parametrize(
    "inv_kwargs",
    [
        {"damping": 0.1},
        {"damping": 0.1, "use_heuristic_damping": True},
        {"damping": 0.1, "use_exact_damping": True},
    ],
    ids=["plain", "heuristic", "exact"],
)
def test_scan_kfac_inverse_equals_unrolled(inv_kwargs):
    """All three damping modes of the stacked inverse match the unrolled one."""
    params_scan, params_unroll, data = _case()
    loss = MSELoss("mean")
    op_s = KFACLinearOperator(
        scan_mlp, loss, params_scan, data,
        fisher_type=FisherType.TYPE2, separate_weight_and_bias=False,
    )
    op_u = KFACLinearOperator(
        unrolled_mlp, loss, params_unroll, data,
        fisher_type=FisherType.TYPE2, separate_weight_and_bias=False,
    )
    vt_s, vt_u = _probe()
    r_s = op_s.inverse(**inv_kwargs) @ vt_s
    r_u = op_u.inverse(**inv_kwargs) @ vt_u
    for l in range(L):
        report_nonclose(r_s["W"][l], r_u[f"W{l}"], 5e-4, 5e-5, name=f"W{l}")


def test_scan_kfac_exact_deep_linear():
    """Scanned deep linear + MSE + TYPE2 == per-slice block-diagonal GGN."""
    params_scan, _, data = _case()
    loss = MSELoss("mean")
    kfac = KFACLinearOperator(
        scan_mlp, loss, params_scan, data,
        fisher_type=FisherType.TYPE2, separate_weight_and_bias=False,
    )
    dense = dense_ggn(scan_mlp, loss, params_scan, data)
    # leaf order in the flat vector: W [L,D,D] then b [L,D]
    nW = L * D * D
    expected = np.zeros_like(dense)
    for l in range(L):
        wlo, whi = l * D * D, (l + 1) * D * D
        blo, bhi = nW + l * D, nW + (l + 1) * D
        idxs = np.r_[wlo:whi, blo:bhi]
        expected[np.ix_(idxs, idxs)] = np.asarray(dense)[np.ix_(idxs, idxs)]
    report_nonclose(kfac.todense(), expected, 5e-4, 1e-5, name="scan kfac")


@pytest.mark.parametrize("separate", [True, False], ids=["separate", "joint"])
def test_scan_ekfac_equals_unrolled(separate):
    """EKFAC batches the stacked eigh/correction; must match the unrolled op."""
    params_scan, params_unroll, data = _case()
    loss = MSELoss("mean")
    ek_s = EKFACLinearOperator(
        scan_mlp, loss, params_scan, data,
        fisher_type=FisherType.TYPE2, separate_weight_and_bias=separate,
    )
    ek_u = EKFACLinearOperator(
        unrolled_mlp, loss, params_unroll, data,
        fisher_type=FisherType.TYPE2, separate_weight_and_bias=separate,
    )
    vt_s, vt_u = _probe()
    _assert_slices_match(ek_s @ vt_s, ek_u @ vt_u)
    ri_s = ek_s.inverse(0.1) @ vt_s
    ri_u = ek_u.inverse(0.1) @ vt_u
    for l in range(L):
        report_nonclose(ri_s["W"][l], ri_u[f"W{l}"], 5e-4, 5e-5, name=f"W{l}")


def test_scan_shared_weight_equals_unrolled_tying():
    """A scan-const weight is weight sharing across iterations: equals the
    unrolled weight-tied model (collector tying path)."""
    W1 = jax.random.normal(jax.random.key(11), (D, D)) * 0.3
    X = jax.random.normal(jax.random.key(12), (B, D))
    y = jax.random.normal(jax.random.key(13), (B, D))
    data = [(X, y)]
    loss = MSELoss("mean")

    def scan_shared(params, x):
        def body(h, _):
            return h @ params["W"], None

        h, _ = jax.lax.scan(body, x, None, length=L)
        return h

    def unrolled_shared(params, x):
        h = x
        for _ in range(L):
            h = h @ params["W"]
        return h

    ps = {"W": W1}
    op_s = KFACLinearOperator(
        scan_shared, loss, ps, data, fisher_type=FisherType.TYPE2
    )
    op_u = KFACLinearOperator(
        unrolled_shared, loss, ps, data, fisher_type=FisherType.TYPE2
    )
    assert op_s.groups[0].stack == 0  # shared, not stacked
    vt = {"W": jax.random.normal(jax.random.key(14), (D, D))}
    report_nonclose((op_s @ vt)["W"], (op_u @ vt)["W"], 2e-4, 2e-5, name="tied")


def test_scan_state_dict_roundtrip():
    """Stacked factors survive state_dict/load_state_dict."""
    params_scan, _, data = _case()
    loss = MSELoss("mean")
    op = KFACLinearOperator(
        scan_mlp, loss, params_scan, data, fisher_type=FisherType.TYPE2
    )
    state = jax.tree.map(np.asarray, op.state_dict())
    vt_s, _ = _probe()
    before = op @ vt_s
    op.load_state_dict(state)
    after = op @ vt_s
    report_nonclose(before["W"], after["W"], 1e-6, 1e-7, name="roundtrip")


def test_scan_gpt_equals_unrolled_gpt():
    """Scan-stacked transformer blocks == unrolled blocks on the tiny GPT."""
    from functools import partial

    from curvlinops_tpu import CrossEntropyLoss
    from curvlinops_tpu.models.gpt import (
        TINY_GPT,
        gpt_apply,
        init_gpt,
        stack_gpt_blocks,
    )
    from curvlinops_tpu.models.resnet import kfac_restricted

    config = TINY_GPT
    params_u = init_gpt(jax.random.key(0), config)
    params_s = stack_gpt_blocks(params_u, config)
    apply_fn = partial(gpt_apply, config=config)
    Bt, T = 2, config.block_size
    tokens = jax.random.randint(jax.random.key(1), (Bt, T), 0, config.vocab_size)
    y = jax.random.randint(jax.random.key(2), (Bt * T,), 0, config.vocab_size)
    data = [(tokens, y)]
    np.testing.assert_allclose(
        apply_fn(params_s, tokens), apply_fn(params_u, tokens), rtol=1e-5, atol=1e-5
    )

    loss = CrossEntropyLoss("mean")
    fn_u, p_u = kfac_restricted(apply_fn, params_u)
    fn_s, p_s = kfac_restricted(apply_fn, params_s)
    k_u = KFACLinearOperator(
        fn_u, loss, p_u, data,
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    k_s = KFACLinearOperator(
        fn_s, loss, p_s, data,
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    assert sum(1 for g in k_s.groups if g.weight_path is not None) == 4
    assert all(g.stack == config.n_layer for g in k_s.groups)

    vt_s = jax.tree.map(
        lambda leaf: jax.random.normal(jax.random.key(5), leaf.shape), p_s
    )
    # keys are keystr paths like "['h0']['attn_qkv']['W']"; map unrolled ->
    # stacked by replacing the layer index with the stacked subtree + slice
    vt_u = {}
    for key, leaf in p_u.items():
        for i in range(config.n_layer):
            tag = f"['h{i}']"
            if tag in key:
                skey = key.replace(tag, "['h']")
                vt_u[key] = vt_s[skey][i]
                break
        else:
            vt_u[key] = vt_s[key]
    r_s = k_s @ vt_s
    r_u = k_u @ vt_u
    for key in p_u:
        for i in range(config.n_layer):
            tag = f"['h{i}']"
            if tag in key:
                skey = key.replace(tag, "['h']")
                report_nonclose(
                    r_s[skey][i], r_u[key], 5e-4, 1e-5, name=key
                )
                break
        else:
            report_nonclose(r_s[key], r_u[key], 5e-4, 1e-5, name=key)


# ---------------------------------------------------------------------- #
# refusals: never silently miscompute
# ---------------------------------------------------------------------- #
def test_scan_refuses_parameter_in_carry():
    """A weight that mutates through the loop carry is refused."""

    def carry_model(params, x):
        def body(carry, _):
            h, w = carry
            return (h @ w, w * 1.01), None

        (h, _), _ = jax.lax.scan(body, (x, params["W"]), None, length=L)
        return h

    ps = {"W": jax.random.normal(jax.random.key(0), (D, D))}
    X = jax.random.normal(jax.random.key(1), (B, D))
    data = [(X, X)]
    with pytest.raises(ValueError, match="carry"):
        KFACLinearOperator(
            carry_model, MSELoss("mean"), ps, data, fisher_type=FisherType.TYPE2
        )


def test_scan_refuses_nested_scan():
    def nested_model(params, x):
        def outer(h, W):
            def inner(hh, _):
                return hh @ W, None

            h2, _ = jax.lax.scan(inner, h, None, length=2)
            return h2, None

        h, _ = jax.lax.scan(outer, x, params["W"])
        return h

    ps = {"W": jax.random.normal(jax.random.key(0), (L, D, D))}
    X = jax.random.normal(jax.random.key(1), (B, D))
    data = [(X, X)]
    with pytest.raises(ValueError, match="nested"):
        KFACLinearOperator(
            nested_model, MSELoss("mean"), ps, data, fisher_type=FisherType.TYPE2
        )


def test_scan_refuses_transposed_stacked_weight():
    def transposed_model(params, x):
        def body(h, W):
            return h @ W, None

        h, _ = jax.lax.scan(body, x, jnp.transpose(params["W"], (0, 2, 1)))
        return h

    ps = {"W": jax.random.normal(jax.random.key(0), (L, D, D))}
    X = jax.random.normal(jax.random.key(1), (B, D))
    data = [(X, X)]
    with pytest.raises(ValueError, match="stacked"):
        KFACLinearOperator(
            transposed_model, MSELoss("mean"), ps, data,
            fisher_type=FisherType.TYPE2,
        )


def test_scan_refuses_kfoc():
    from curvlinops_tpu.kfac.kfoc import KFOCLinearOperator

    params_scan, _, data = _case()
    with pytest.raises(ValueError, match="scan-stacked"):
        KFOCLinearOperator(
            scan_mlp, MSELoss("mean"), params_scan, [data[0]],
            fisher_type=FisherType.TYPE2,
        )
