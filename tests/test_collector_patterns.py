"""Collector pattern-matching axes: views, transposed weights, bad biases.

Mirrors the reference's param-IO detection suite
(``test/computers/io_collector/test_param_io.py:190-313``): the collector
must refuse, never silently mis-attach, when a bias add does not line up
with its layer's output features — and must see through genuine views.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import FisherType, MSELoss
from curvlinops_tpu.kfac.collector import TracedModel
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.test_kfac import blockdiag_projection
from tests.utils import dense_ggn, report_nonclose


def test_reshape_altering_last_dim_breaks_bias_pairing():
    """``x@W -> reshape(B,2,2) -> +b(2,)``: b is NOT the layer's bias
    (reference ``test_param_io.py:190``)."""

    def f(p, x):
        out = x @ p["W"]
        return out.reshape(x.shape[0], 2, 2) + p["b"]

    with pytest.raises(ValueError, match="unsupported primitive"):
        TracedModel(f, {"W": jnp.zeros((6, 4)), "b": jnp.zeros((2,))},
                    jnp.zeros((3, 6)))


def test_view_after_linear_not_absorbed():
    """A last-dim-preserving view after the linear leaves the layer intact
    (reference ``test_param_io.py:211``)."""

    def f(p, x):
        out = x @ p["W"] + p["b"]
        return out.reshape(x.shape[0], 1, 4)

    tm = TracedModel(f, {"W": jnp.zeros((3, 4)), "b": jnp.zeros((4,))},
                     jnp.zeros((2, 3)))
    (u,) = tm.layers
    assert u.kind == "dense" and u.bias_path is not None
    assert u.meta["d_out"] == 4


def test_positional_bias_refused():
    """A (S,)-leaf broadcast over the feature axis is not a bias."""

    def f(p, x):  # x: [B, S, D]
        out = jnp.einsum("bsd,df->bsf", x, p["W"])
        return out + p["b"][None, :, None]

    with pytest.raises(ValueError, match="cannot be the bias"):
        TracedModel(f, {"W": jnp.zeros((3, 4)), "b": jnp.zeros((5,))},
                    jnp.zeros((2, 5, 3)))


def test_weight_also_reduced_into_bias_refused():
    """``x@W + W.sum(0)``: the second use path is not a layer
    (reference ``test_param_io.py:271``)."""

    def f(p, x):
        W = p["W"]
        return x @ W + W.sum(0)

    with pytest.raises(ValueError, match="unsupported primitive"):
        TracedModel(f, {"W": jnp.zeros((3, 4))}, jnp.zeros((2, 3)))


def test_transposed_weight_supported_and_exact():
    """``x @ W.T + b`` works via the view chain (the reference refuses
    ``.T``, ``test_param_io.py:234`` — jaxpr canonicalization does better)."""
    key = jax.random.key(7)
    kw, kb, kx, ky = jax.random.split(key, 4)
    params = {
        "W": jax.random.normal(kw, (4, 3)) / 2.0,
        "b": 0.1 * jax.random.normal(kb, (4,)),
    }

    def f(p, x):
        return x @ p["W"].T + p["b"]

    data = [(jax.random.normal(kx, (1, 3)), jax.random.normal(ky, (1, 4)))]
    kfac = KFACLinearOperator(
        f, MSELoss("mean"), params, data, fisher_type=FisherType.TYPE2,
        check_deterministic=False,
    )
    dense = dense_ggn(f, MSELoss("mean"), params, data)
    expected = blockdiag_projection(dense, params, kfac.groups)
    report_nonclose(kfac.todense(), expected, rtol=5e-4, atol=1e-5,
                    name="transposed weight")


def test_multiple_uses_recorded():
    """Recurrent reuse of one weight is recorded as two uses
    (reference ``test_param_io.py:253``)."""

    def f(p, x):
        h = x @ p["W"] + p["b"]
        return h @ p["W"]

    tm = TracedModel(
        f, {"W": jnp.zeros((3, 3)), "b": jnp.zeros((3,))}, jnp.zeros((2, 3))
    )
    assert len(tm.layers) == 2
    assert tm.layers[0].bias_path is not None
    assert tm.layers[1].bias_path is None


def test_conv_bias_wrong_channel_count_refused():
    """Conv + a bias whose size is not the out-channel count is refused."""

    def f(p, x):  # x: [B, 8, 8, 3]
        z = jax.lax.conv_general_dilated(
            x, p["W"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return z + p["b"]

    with pytest.raises(ValueError, match="cannot be the bias"):
        TracedModel(
            f,
            {"W": jnp.zeros((3, 3, 3, 5)), "b": jnp.zeros((1, 1, 1))},
            jnp.zeros((2, 8, 8, 3)),
        )


def test_conv_bias_correct_channel_count_ok():
    def f(p, x):
        z = jax.lax.conv_general_dilated(
            x, p["W"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return z + p["b"]

    tm = TracedModel(
        f,
        {"W": jnp.zeros((3, 3, 3, 5)), "b": jnp.zeros((5,))},
        jnp.zeros((2, 8, 8, 3)),
    )
    (u,) = tm.layers
    assert u.kind == "conv" and u.bias_path is not None


def test_bias_tied_across_different_layers_refused():
    """One bias leaf on two different-weight layers would duplicate its
    canonical block (from_canonical writes would silently overwrite)."""

    def f(p, x):
        h = jnp.tanh(x @ p["W1"] + p["b"])
        return h @ p["W2"] + p["b"]

    with pytest.raises(ValueError, match="tied across different layers"):
        TracedModel(
            f,
            {"W1": jnp.zeros((4, 4)), "W2": jnp.zeros((4, 4)),
             "b": jnp.zeros(4)},
            jnp.zeros((3, 4)),
        )


def test_reversed_bias_refused():
    """``x@W + b[::-1]`` silently permutes the bias block — refuse."""

    def f(p, x):
        return x @ p["W"] + p["b"][::-1]

    with pytest.raises(ValueError, match="identity ordering"):
        TracedModel(
            f, {"W": jnp.zeros((4, 5)), "b": jnp.zeros(5)}, jnp.zeros((3, 4))
        )


def test_position_broadcast_masquerading_as_bias_refused():
    """A (S,)-leaf broadcast along the SEQUENCE axis with S == d_out passes
    the size check but is not a per-feature bias — refuse."""

    def f(p, x):  # x: [B, S, D] with S == d_out == 4
        return x @ p["W"] + p["pos"][None, :, None]

    with pytest.raises(ValueError, match="output-feature axis"):
        TracedModel(
            f,
            {"W": jnp.zeros((5, 4)), "pos": jnp.zeros(4)},
            jnp.zeros((2, 4, 5)),
        )


def test_normal_seq_bias_still_accepted():
    """The standard [B, S, d] + b(d,) broadcast must keep working."""

    def f(p, x):
        return x @ p["W"] + p["b"]

    tm = TracedModel(
        f, {"W": jnp.zeros((5, 4)), "b": jnp.zeros(4)}, jnp.zeros((2, 6, 5))
    )
    (u,) = tm.layers
    assert u.bias_path is not None


def test_bias_on_transformed_scan_output_refused():
    """relu(scan(...)) + b must refuse like the unrolled equivalent (bias
    added to a transformed output of matched layers)."""

    def f(p, x):
        def body(h, W):
            return jnp.tanh(h @ W), None

        h, _ = jax.lax.scan(body, x, p["Ws"])
        return jax.nn.relu(h) + p["b"]

    with pytest.raises(ValueError, match="unsupported primitive"):
        TracedModel(
            f,
            {"Ws": jnp.zeros((2, 4, 4)), "b": jnp.zeros(4)},
            jnp.zeros((3, 4)),
        )


def test_nchw_conv_spatial_broadcast_not_bias():
    """NCHW conv with W_out == C_out: a (C,)-leaf broadcast along the LAST
    SPATIAL axis must refuse (only out_spec[1] is the channel axis)."""

    def f(p, x):  # x: [B, 3, 6, 6], conv SAME -> [B, 6, 6, 6]
        z = jax.lax.conv_general_dilated(
            x, p["W"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return z + p["pos"]  # (6,) broadcasts onto the WIDTH axis

    with pytest.raises(ValueError, match="output-feature axis"):
        TracedModel(
            f,
            {"W": jnp.zeros((6, 3, 3, 3)), "pos": jnp.zeros(6)},
            jnp.zeros((2, 3, 6, 6)),
        )


def test_nchw_conv_channel_bias_accepted():
    """The genuine NCHW channel bias ((C,1,1) broadcast onto axis 1) stays
    accepted."""

    def f(p, x):
        z = jax.lax.conv_general_dilated(
            x, p["W"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return z + p["b"][None, :, None, None]

    tm = TracedModel(
        f,
        {"W": jnp.zeros((5, 3, 3, 3)), "b": jnp.zeros(5)},
        jnp.zeros((2, 3, 6, 6)),
    )
    (u,) = tm.layers
    assert u.kind == "conv" and u.bias_path is not None
