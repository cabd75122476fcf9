"""ResNet-18 / ResNet-50 in pure JAX (NHWC), eval-mode BatchNorm.

Counterparts of the reference benchmark problems
``synthetic_cifar10_resnet18`` / ``synthetic_imagenet_resnet50``
(``docs/examples/basic_usage/benchmark_utils.py:380-417``), re-implemented
TPU-first: NHWC layout (native for TPU convolutions), functional
``(params, x) -> logits`` with BatchNorm running statistics closed over as
constants (curvature analysis runs models in eval mode, like the reference's
``model.eval()``).

KFAC operates on the conv/fc parameters only; BatchNorm affine parameters are
closed over via :func:`kfac_restricted` (mirroring the reference benchmark's
Linear/Conv2d-only selection, ``benchmark_execute.py:171-183``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from curvlinops_tpu.losses import CrossEntropyLoss
from curvlinops_tpu.models.common import Problem, he_normal

_BN_EPS = 1e-5


def _conv(x, W, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x,
        W,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p):
    # eval mode: running stats are (0, 1) constants -> affine scale/shift
    return p["scale"] * x + p["bias"]


def _bn_calibrating(x, p):
    """Calibration-mode BN: fold THIS batch's statistics into the affine.

    Writes ``scale = 1/sqrt(var + eps)``, ``bias = -mean * scale`` into the
    (mutable copy of the) param subtree and normalizes with them — the
    sequential, layer-by-layer equivalent of real running statistics.
    """
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(0, 1, 2))
    v = jnp.var(xf, axis=(0, 1, 2))
    scale = (1.0 / jnp.sqrt(v + _BN_EPS)).astype(x.dtype)
    p["scale"] = scale
    p["bias"] = (-m).astype(x.dtype) * scale
    return _bn(x, p)


def _maxpool(x, window=3, stride=2):
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pads
    )


def _init_conv(key, kh, kw, c_in, c_out):
    return he_normal(key, (kh, kw, c_in, c_out), kh * kw * c_in)


def _init_bn(c):
    return {"scale": jnp.ones(c), "bias": jnp.zeros(c)}


# ---------------------------------------------------------------------- #
# blocks
# ---------------------------------------------------------------------- #
def _basic_block(params, x, stride, bn=_bn):
    identity = x
    out = _conv(x, params["conv1"]["W"], stride)
    out = jax.nn.relu(bn(out, params["bn1"]))
    out = _conv(out, params["conv2"]["W"], 1)
    out = bn(out, params["bn2"])
    if "downsample" in params:
        identity = bn(
            _conv(x, params["downsample"]["conv"]["W"], stride),
            params["downsample"]["bn"],
        )
    return jax.nn.relu(out + identity)


def _init_basic_block(key, c_in, c_out, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": {"W": _init_conv(k1, 3, 3, c_in, c_out)},
        "bn1": _init_bn(c_out),
        "conv2": {"W": _init_conv(k2, 3, 3, c_out, c_out)},
        "bn2": _init_bn(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["downsample"] = {
            "conv": {"W": _init_conv(k3, 1, 1, c_in, c_out)},
            "bn": _init_bn(c_out),
        }
    return p


def _bottleneck_block(params, x, stride, bn=_bn):
    identity = x
    out = jax.nn.relu(bn(_conv(x, params["conv1"]["W"], 1), params["bn1"]))
    out = jax.nn.relu(bn(_conv(out, params["conv2"]["W"], stride), params["bn2"]))
    out = bn(_conv(out, params["conv3"]["W"], 1), params["bn3"])
    if "downsample" in params:
        identity = bn(
            _conv(x, params["downsample"]["conv"]["W"], stride),
            params["downsample"]["bn"],
        )
    return jax.nn.relu(out + identity)


def _init_bottleneck(key, c_in, width, stride):
    c_out = width * 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": {"W": _init_conv(k1, 1, 1, c_in, width)},
        "bn1": _init_bn(width),
        "conv2": {"W": _init_conv(k2, 3, 3, width, width)},
        "bn2": _init_bn(width),
        "conv3": {"W": _init_conv(k3, 1, 1, width, c_out)},
        "bn3": _init_bn(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["downsample"] = {
            "conv": {"W": _init_conv(k4, 1, 1, c_in, c_out)},
            "bn": _init_bn(c_out),
        }
    return p


# ---------------------------------------------------------------------- #
# networks
# ---------------------------------------------------------------------- #
_CONFIGS = {
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2), widths=(64, 128, 256, 512)),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3),
                     widths=(64, 128, 256, 512)),
}


def resnet_apply(params: Any, x: jax.Array, *, block: str, bn=_bn) -> jax.Array:
    """ResNet forward pass ``[N, H, W, 3] -> [N, num_classes]``."""
    block_fn = _basic_block if block == "basic" else _bottleneck_block
    out = _conv(x, params["conv1"]["W"], 2)
    out = jax.nn.relu(bn(out, params["bn1"]))
    out = _maxpool(out)
    for si in range(4):
        stage = params[f"layer{si + 1}"]
        for bi in range(len(stage)):
            stride = 2 if (si > 0 and bi == 0) else 1
            out = block_fn(stage[f"block{bi}"], out, stride, bn=bn)
    out = jnp.mean(out, axis=(1, 2))
    return out @ params["fc"]["W"] + params["fc"]["b"]


def calibrate_bn(params: Any, x: jax.Array, *, block: str) -> Any:
    """Fold one batch's per-channel statistics into the eval-mode BN affines.

    The reference's ResNet-50 benchmark uses PRETRAINED torchvision weights
    (``benchmark_utils.py:395``, real ImageNet running statistics) and its
    ResNet-18 runs train-mode BatchNorm (batch statistics) — both see
    normalized activations.  With identity affines on random init, eval-mode
    activations explode instead (~1e2 per stage; logits O(1e3)): the softmax
    saturates, MC-Fisher grad-outputs underflow to EXACT zeros for the deep
    half of the network, and f32 Gram roundoff (eps * ||aaT||, order 1 at
    ||aaT|| ~ 1e8) exceeds any reasonable damping, so damped Cholesky
    legitimately fails.  Calibration is the functional stand-in for real
    running statistics: one forward pass on calibration data, each BN site
    folding ``scale = 1/sqrt(var+eps)``, ``bias = -mean*scale`` into its
    affine sequentially (downstream sites see already-normalized inputs).
    Jitted; the returned pytree has the same structure/dtypes as ``params``.
    """
    def impl(p, xb):
        p = jax.tree.map(lambda a: a, p)  # fresh containers, safe to mutate
        resnet_apply(p, xb, block=block, bn=_bn_calibrating)
        return p

    return jax.jit(impl)(params, x)


def init_resnet(key, arch: str, num_classes: int, dtype=jnp.float32) -> Any:
    """Initialize a ResNet parameter pytree."""
    cfg = _CONFIGS[arch]
    keys = jax.random.split(key, 6)
    params = {
        "conv1": {"W": _init_conv(keys[0], 7, 7, 3, 64)},
        "bn1": _init_bn(64),
    }
    expansion = 1 if cfg["block"] == "basic" else 4
    c_in = 64
    for si, (n_blocks, width) in enumerate(zip(cfg["layers"], cfg["widths"])):
        stage = {}
        for bi in range(n_blocks):
            kb = jax.random.fold_in(keys[1], si * 16 + bi)
            stride = 2 if (si > 0 and bi == 0) else 1
            if cfg["block"] == "basic":
                stage[f"block{bi}"] = _init_basic_block(kb, c_in, width, stride)
                c_in = width
            else:
                stage[f"block{bi}"] = _init_bottleneck(kb, c_in, width, stride)
                c_in = width * expansion
        params[f"layer{si + 1}"] = stage
    params["fc"] = {
        "W": he_normal(keys[2], (c_in, num_classes), c_in),
        "b": jnp.zeros(num_classes),
    }
    return jax.tree.map(lambda a: a.astype(dtype), params)


def kfac_restricted(apply_fn, params, include_embeddings: bool = False):
    """Split params into (conv/fc leaves for KFAC, frozen rest) + wrapped fn.

    Returns:
        ``(kfac_model_fn, kfac_params)`` — leaves under ``conv*``/``fc``/
        ``dense*`` keys with all dims <= 50k; the rest (BatchNorm affines,
        huge dense heads) travel as a
        :class:`curvlinops_tpu.utils.misc.FrozenModelFn` frozen pytree, so
        they enter jitted kernels as runtime arguments instead of HLO
        constants. ``include_embeddings`` additionally covers embedding
        tables (``wte``/``wpe``/``emb*`` keys, any vocab size — the KFAC
        input covariance of a lookup is stored as a diagonal vector).
    """
    from curvlinops_tpu.utils.misc import FrozenModelFn

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def is_kfac(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        if any(str(k).startswith(("wte", "wpe", "emb")) for k in keys):
            return include_embeddings
        supported = any(
            str(k).startswith(("conv", "fc", "dense", "attn", "mlp"))
            for k in keys
        ) and not any(str(k).startswith(("bn", "ln")) for k in keys)
        return supported and all(d <= 50_000 for d in jnp.shape(leaf))

    kfac_flat = {
        jax.tree_util.keystr(p): leaf for p, leaf in flat if is_kfac(p, leaf)
    }
    frozen_flat = {
        jax.tree_util.keystr(p): leaf for p, leaf in flat if not is_kfac(p, leaf)
    }

    def raw_fn(frozen, kfac_params, x):
        leaves = [
            kfac_params[jax.tree_util.keystr(p)]
            if jax.tree_util.keystr(p) in kfac_params
            else frozen[jax.tree_util.keystr(p)]
            for p, _ in flat
        ]
        return apply_fn(jax.tree_util.tree_unflatten(treedef, leaves), x)

    return FrozenModelFn(raw_fn, frozen_flat), kfac_flat


def cifar10_resnet18(batch_size: int = 512, seed: int = 0, dtype=jnp.float32) -> Problem:
    """ResNet-18 on synthetic CIFAR-10 (32x32x3, 10 classes)."""
    key = jax.random.key(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_resnet(kp, "resnet18", 10, dtype)
    apply_fn = partial(resnet_apply, block="basic")
    X = jax.random.uniform(kx, (batch_size, 32, 32, 3), dtype)
    y = jax.random.randint(ky, (batch_size,), 0, 10)
    # normalized activation scales, like the reference's train-mode BN
    # (see calibrate_bn); bounded calibration batch keeps setup cheap
    params = calibrate_bn(params, X[: min(batch_size, 64)], block="basic")
    kfac_fn, kfac_params = kfac_restricted(apply_fn, params)
    return Problem(
        "synthetic_cifar10_resnet18",
        apply_fn,
        CrossEntropyLoss("mean"),
        params,
        [(X, y)],
        kfac_fn,
        kfac_params,
    )


def imagenet_resnet50(batch_size: int = 64, seed: int = 0, dtype=jnp.float32) -> Problem:
    """ResNet-50 on synthetic ImageNet (224x224x3, 1000 classes)."""
    key = jax.random.key(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_resnet(kp, "resnet50", 1000, dtype)
    apply_fn = partial(resnet_apply, block="bottleneck")
    X = jax.random.uniform(kx, (batch_size, 224, 224, 3), dtype)
    y = jax.random.randint(ky, (batch_size,), 0, 1000)
    # normalized activation scales, like the reference's PRETRAINED BN
    # running stats (see calibrate_bn); bounded calibration batch
    params = calibrate_bn(params, X[: min(batch_size, 32)], block="bottleneck")
    kfac_fn, kfac_params = kfac_restricted(apply_fn, params)
    return Problem(
        "synthetic_imagenet_resnet50",
        apply_fn,
        CrossEntropyLoss("mean"),
        params,
        [(X, y)],
        kfac_fn,
        kfac_params,
    )
