"""Randomized test cases: small functional models x losses x reductions.

JAX analogue of the reference's case dictionaries (``test/cases.py``): each
case is a dict with ``model_fn``, ``loss_fn``, ``params``, ``data`` built
lazily from a seed. Coverage axes mirror the reference: MSE/CE/BCE x mean/sum,
dict-valued inputs with ``batch_size_fn``, >2d outputs (weight sharing), and a
small CNN.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from curvlinops_tpu.losses import BCEWithLogitsLoss, CrossEntropyLoss, MSELoss


def _mlp_params(key, sizes):
    params = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (k, (d_in, d_out)) in enumerate(zip(keys, zip(sizes[:-1], sizes[1:]))):
        k1, k2 = jax.random.split(k)
        params[f"layer{i}"] = {
            "W": jax.random.normal(k1, (d_in, d_out)) / jnp.sqrt(d_in),
            "b": 0.1 * jax.random.normal(k2, (d_out,)),
        }
    return params


def mlp_fn(params: Any, x: jax.Array) -> jax.Array:
    """Tanh MLP ``(params, [N, D_in]) -> [N, D_out]``."""
    n_layers = len(params)
    for i in range(n_layers):
        layer = params[f"layer{i}"]
        x = x @ layer["W"] + layer["b"]
        if i < n_layers - 1:
            x = jnp.tanh(x)
    return x


def _cnn_params(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": {
            "W": 0.3 * jax.random.normal(k1, (3, 3, 1, 4)),  # HWIO
            "b": 0.05 * jax.random.normal(k2, (4,)),
        },
        "dense": {
            "W": 0.3 * jax.random.normal(k3, (4 * 4 * 4, 3)),
            "b": 0.05 * jax.random.normal(k4, (3,)),
        },
    }


def cnn_fn(params: Any, x: jax.Array) -> jax.Array:
    """Tiny CNN: conv(3x3, stride 2) -> relu -> flatten -> dense. NHWC in [N,8,8,1]."""
    z = jax.lax.conv_general_dilated(
        x,
        params["conv1"]["W"],
        window_strides=(2, 2),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    z = jax.nn.relu(z + params["conv1"]["b"])
    z = z.reshape(z.shape[0], -1)
    return z @ params["dense"]["W"] + params["dense"]["b"]


def seq_mlp_fn(params: Any, x: jax.Array) -> jax.Array:
    """Weight-shared MLP over sequences: ``[N, S, D_in] -> [N, C, S]`` (CE layout)."""
    out = mlp_fn(params, x)  # applies on last axis -> [N, S, C]
    return jnp.moveaxis(out, -1, 1)


def dict_mlp_fn(params: Any, x: dict) -> jax.Array:
    """MLP over dict-valued inputs (tests ``batch_size_fn``)."""
    return mlp_fn(params, x["features"])


def make_case(name: str, seed: int = 0) -> dict:
    """Construct a named case (model_fn, loss_fn, params, data[, batch_size_fn])."""
    key = jax.random.key(seed)
    k_param, k_x, k_y = jax.random.split(key, 3)

    if name.startswith("mlp_mse"):
        sizes, N, batches = [5, 8, 3], 12, 3
        params = _mlp_params(k_param, sizes)
        X = jax.random.normal(k_x, (N, sizes[0]))
        y = jax.random.normal(k_y, (N, sizes[-1]))
        reduction = "mean" if name.endswith("mean") else "sum"
        data = _split(X, y, batches)
        return dict(
            model_fn=mlp_fn, loss_fn=MSELoss(reduction), params=params, data=data
        )

    if name.startswith("mlp_ce"):
        sizes, N, batches, C = [6, 7, 4], 12, 3, 4
        params = _mlp_params(k_param, sizes)
        X = jax.random.normal(k_x, (N, sizes[0]))
        y = jax.random.randint(k_y, (N,), 0, C)
        reduction = "mean" if name.endswith("mean") else "sum"
        return dict(
            model_fn=mlp_fn,
            loss_fn=CrossEntropyLoss(reduction),
            params=params,
            data=_split(X, y, batches),
        )

    if name.startswith("mlp_bce"):
        sizes, N, batches = [4, 6, 2], 12, 3
        params = _mlp_params(k_param, sizes)
        X = jax.random.normal(k_x, (N, sizes[0]))
        y = jax.random.bernoulli(k_y, 0.5, (N, sizes[-1])).astype(jnp.float32)
        reduction = "mean" if name.endswith("mean") else "sum"
        return dict(
            model_fn=mlp_fn,
            loss_fn=BCEWithLogitsLoss(reduction),
            params=params,
            data=_split(X, y, batches),
        )

    if name.startswith("dict_mse"):
        sizes, N, batches = [5, 6, 3], 8, 2
        params = _mlp_params(k_param, sizes)
        X = jax.random.normal(k_x, (N, sizes[0]))
        y = jax.random.normal(k_y, (N, sizes[-1]))
        data = [
            ({"features": xb, "meta": jnp.zeros((xb.shape[0],))}, yb)
            for xb, yb in zip(jnp.split(X, 2), jnp.split(y, 2))
        ]
        return dict(
            model_fn=dict_mlp_fn,
            loss_fn=MSELoss("mean"),
            params=params,
            data=data,
            batch_size_fn=lambda X: X["features"].shape[0],
        )

    if name.startswith("seq_ce"):
        # weight sharing: sequence of length S, CE over [N, C, S]
        sizes, N, S, batches = [5, 6, 3], 8, 4, 2
        params = _mlp_params(k_param, sizes)
        X = jax.random.normal(k_x, (N, S, sizes[0]))
        y = jax.random.randint(k_y, (N, S), 0, sizes[-1])
        reduction = "mean" if name.endswith("mean") else "sum"
        return dict(
            model_fn=seq_mlp_fn,
            loss_fn=CrossEntropyLoss(reduction),
            params=params,
            data=_split(X, y, batches),
        )

    if name.startswith("seq_bce"):
        # weight sharing with BCE: elementwise loss over [N, S, C]
        sizes, N, S, batches = [5, 6, 3], 8, 4, 2
        params = _mlp_params(k_param, sizes)
        X = jax.random.normal(k_x, (N, S, sizes[0]))
        y = jax.random.bernoulli(k_y, 0.5, (N, S, sizes[-1])).astype(
            jnp.float32
        )
        reduction = "mean" if name.endswith("mean") else "sum"
        return dict(
            model_fn=mlp_fn,  # applies along the last axis -> [N, S, C]
            loss_fn=BCEWithLogitsLoss(reduction),
            params=params,
            data=_split(X, y, batches),
        )

    if name.startswith("cnn_ce"):
        N, batches = 8, 2
        params = _cnn_params(k_param)
        X = jax.random.normal(k_x, (N, 8, 8, 1))
        y = jax.random.randint(k_y, (N,), 0, 3)
        return dict(
            model_fn=cnn_fn,
            loss_fn=CrossEntropyLoss("mean"),
            params=params,
            data=_split(X, y, batches),
        )

    raise ValueError(f"Unknown case {name!r}.")


def _split(X, y, num_batches):
    return list(zip(jnp.split(X, num_batches), jnp.split(y, num_batches)))


CASE_NAMES = [
    "mlp_mse_mean",
    "mlp_mse_sum",
    "mlp_ce_mean",
    "mlp_ce_sum",
    "mlp_bce_mean",
    "dict_mse",
    "seq_ce_mean",
    "seq_ce_sum",
    "seq_bce_mean",
    "cnn_ce",
]
