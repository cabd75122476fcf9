"""The REDUCE-mode averaged-patch extraction must equal the mean of the
materialized patch tensor for every conv configuration (and fall back for
input-dilated convs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu.kfac.math import (
    extract_averaged_patches,
    extract_conv_patches,
    input_to_sharing_format,
)


def _meta(
    x_shape,
    w_shape,
    dim_spec=("NCHW", "OIHW", "NCHW"),
    strides=(1, 1),
    padding=((0, 0), (0, 0)),
    lhs_dilation=(1, 1),
    rhs_dilation=(1, 1),
    groups=1,
):
    dn = jax.lax.conv_dimension_numbers(x_shape, w_shape, dim_spec)
    return {
        "dimension_numbers": dn,
        "w_shape": w_shape,
        "window_strides": strides,
        "padding": padding,
        "lhs_dilation": lhs_dilation,
        "rhs_dilation": rhs_dilation,
        "feature_group_count": groups,
        "batch_group_count": 1,
    }


CASES = [
    ("plain3x3", dict(strides=(1, 1), padding=((1, 1), (1, 1)))),
    ("strided", dict(strides=(2, 2), padding=((1, 1), (1, 1)))),
    ("asym_pad", dict(strides=(2, 1), padding=((0, 1), (2, 0)))),
    ("dilated", dict(rhs_dilation=(2, 2), padding=((2, 2), (2, 2)))),
    ("no_pad", dict(strides=(1, 2), padding=((0, 0), (0, 0)))),
]


@pytest.mark.parametrize("name,kwargs", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("layout", ["NCHW", "NHWC"])
def test_averaged_equals_mean_of_patches(name, kwargs, layout):
    B, C, H, W, O, K = 3, 4, 9, 8, 5, 3
    x_shape = (B, C, H, W) if layout == "NCHW" else (B, H, W, C)
    w_shape = (O, C, K, K)
    spec = (layout, "OIHW", layout)
    meta = _meta(x_shape, w_shape, dim_spec=spec, **kwargs)
    x = jax.random.normal(jax.random.key(0), x_shape)

    full = extract_conv_patches(x, meta)  # [B, S, d_in]
    avg = extract_averaged_patches(x, meta)  # [B, 1, d_in]
    assert avg is not None and avg.shape == (B, 1, full.shape[-1])
    np.testing.assert_allclose(
        np.asarray(avg[:, 0]), np.asarray(full.mean(axis=1)), atol=1e-5
    )


def test_grouped_conv_averaged():
    B, C, H, W = 2, 6, 7, 7
    groups = 3
    w_shape = (6, C // groups, 3, 3)
    meta = _meta((B, C, H, W), w_shape, padding=((1, 1), (1, 1)), groups=groups)
    x = jax.random.normal(jax.random.key(1), (B, C, H, W))
    full = extract_conv_patches(x, meta)
    avg = extract_averaged_patches(x, meta)
    np.testing.assert_allclose(
        np.asarray(avg[:, 0]), np.asarray(full.mean(axis=1)), atol=1e-5
    )


def test_input_dilated_falls_back():
    meta = _meta((2, 3, 8, 8), (4, 3, 3, 3), lhs_dilation=(2, 2),
                 padding=((1, 1), (1, 1)))
    x = jax.random.normal(jax.random.key(2), (2, 3, 8, 8))
    assert extract_averaged_patches(x, meta) is None
    # the sharing-format path must still produce the materialized mean
    out = input_to_sharing_format(x, "conv", meta, "reduce")
    full = extract_conv_patches(x, meta)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full.mean(axis=1, keepdims=True)), atol=1e-5
    )


def test_negative_padding_falls_back():
    """Negative padding (cropping) is valid in lax convs but not jnp.pad:
    the averaged path must refuse and the sharing-format path must still
    produce the materialized mean."""
    meta = _meta((2, 3, 8, 8), (4, 3, 3, 3), padding=((-1, 0), (0, -1)))
    x = jax.random.normal(jax.random.key(4), (2, 3, 8, 8))
    assert extract_averaged_patches(x, meta) is None
    out = input_to_sharing_format(x, "conv", meta, "reduce")
    full = extract_conv_patches(x, meta)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full.mean(axis=1, keepdims=True)), atol=1e-5
    )


def test_sharing_format_reduce_uses_averaged_path():
    meta = _meta((2, 3, 8, 8), (4, 3, 3, 3), strides=(2, 2),
                 padding=((1, 1), (1, 1)))
    x = jax.random.normal(jax.random.key(3), (2, 3, 8, 8))
    out = input_to_sharing_format(x, "conv", meta, "reduce", bias_pad=1.0)
    full = extract_conv_patches(x, meta).mean(axis=1, keepdims=True)
    expect = jnp.concatenate([full, jnp.ones((2, 1, 1))], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


@pytest.mark.parametrize("approx", ["expand", "reduce"])
@pytest.mark.parametrize("bias_pad", [None, 1.0, 0.0])
def test_input_covariance_block_form_equals_concat(approx, bias_pad):
    """``input_covariance`` folds the bias-pad column in closed block form;
    it must equal the concat-then-einsum covariance exactly (same f32
    accumulation), for dense, conv, and stacked-scan inputs."""
    from curvlinops_tpu.kfac.math import input_covariance

    key = jax.random.key(5)

    def concat_cov(x, kind, meta):
        a = input_to_sharing_format(x, kind, meta, approx, bias_pad=bias_pad)
        cov = (
            jnp.einsum("lbsi,lbsj->lij", a, a,
                       preferred_element_type=jnp.float32)
            if a.ndim == 4
            else jnp.einsum("bsi,bsj->ij", a, a,
                            preferred_element_type=jnp.float32)
        )
        return cov, a.shape[-2]

    cases = [
        ("dense", {"x_contract": (2,), "d_in": 12},
         jax.random.normal(key, (6, 4, 12))),
        ("dense", {"x_contract": (2,), "d_in": 12,
                   "scan": {"kind": "stacked"}},
         jax.random.normal(jax.random.fold_in(key, 1), (3, 6, 4, 12))),
        ("conv", _meta((4, 3, 8, 8), (5, 3, 3, 3),
                       padding=((1, 1), (1, 1))),
         jax.random.normal(jax.random.fold_in(key, 2), (4, 3, 8, 8))),
    ]
    for kind, meta, x in cases:
        c0, s0 = concat_cov(x, kind, meta)
        c1, s1 = input_covariance(x, kind, meta, approx, bias_pad=bias_pad)
        assert s0 == s1
        np.testing.assert_allclose(
            np.asarray(c1), np.asarray(c0), atol=1e-5, rtol=1e-5
        )
