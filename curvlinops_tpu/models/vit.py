"""Vision Transformer (ViT) in pure JAX.

The reference's model zoo stops at MLP/ResNet/nanoGPT
(``docs/examples/basic_usage/benchmark_utils.py:341-449``); ViT is the
missing mainstream family that combines BOTH layer kinds the KFAC jaxpr
collector supports in one model — a conv patch embedding (kernel == stride,
no padding) feeding dense attention/MLP blocks — so it doubles as a
discovery stress test: conv + dense + LayerNorm + parameters used as plain
activations (CLS token, positional embedding) in a single jaxpr.

TPU-first choices mirror ``models/gpt.py``: dense layers are plain
``x @ W + b`` dot_generals, attention is a batched einsum softmax
(non-causal), the patch embedding is one ``lax.conv_general_dilated`` whose
output feature dim lands on the MXU lane axis, and LayerNorm/CLS/positional
parameters stay out of the KFAC set via
:func:`curvlinops_tpu.models.resnet.kfac_restricted`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from curvlinops_tpu.losses import CrossEntropyLoss
from curvlinops_tpu.models.common import Problem, lecun_normal
from curvlinops_tpu.models.resnet import kfac_restricted


@dataclass(frozen=True)
class ViTConfig:
    """Model geometry (defaults = ViT-S/4 for CIFAR-scale 32x32 inputs)."""

    image_size: int = 32
    patch_size: int = 4
    in_channels: int = 3
    n_layer: int = 6
    n_head: int = 6
    n_embd: int = 384
    num_classes: int = 10

    @property
    def n_patches(self) -> int:
        side = self.image_size // self.patch_size
        return side * side


def _layernorm(x, p):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return p["scale"] * (x - mean) * jax.lax.rsqrt(var + 1e-5) + p["bias"]


def _attention(params, x, n_head):
    """Bidirectional einsum-softmax attention (the GPT path, minus the
    causal mask — ViT encoders attend globally)."""
    B, T, C = x.shape
    qkv = x @ params["attn_qkv"]["W"] + params["attn_qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = C // n_head

    def heads(t):
        return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, x.dtype)
    )
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return out @ params["attn_proj"]["W"] + params["attn_proj"]["b"]


def _block(params, x, n_head):
    x = x + _attention(params, _layernorm(x, params["ln1"]), n_head)
    h = _layernorm(x, params["ln2"])
    h = jax.nn.gelu(h @ params["mlp_fc"]["W"] + params["mlp_fc"]["b"])
    return x + (h @ params["mlp_proj"]["W"] + params["mlp_proj"]["b"])


def vit_apply(
    params, images, *, config: ViTConfig, remat_blocks: bool = True
) -> jax.Array:
    """Forward pass ``[B, H, W, C] images -> [B, num_classes] logits``.

    Accepts either per-layer block params (``h0..h{n-1}`` keys, unrolled
    Python loop) or scan-stacked block params (one ``h`` subtree with a
    leading ``n_layer`` axis, applied with ``lax.scan`` — same semantics as
    ``models/gpt.py``: one compiled block body, KFAC factors batched over
    the stack; ``remat_blocks`` checkpoints the scanned body)."""
    B = images.shape[0]
    P = config.patch_size
    # non-overlapping patch embedding: one conv with kernel == stride
    x = jax.lax.conv_general_dilated(
        images,
        params["conv_patch"]["W"],
        window_strides=(P, P),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["conv_patch"]["b"]
    x = x.reshape(B, -1, config.n_embd)  # [B, N, D]
    cls = jnp.broadcast_to(params["cls"], (B, 1, config.n_embd))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"]
    if "h" in params:  # scan-stacked blocks

        def body(h, block_params):
            return _block(block_params, h, config.n_head), None

        if remat_blocks:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, params["h"])
    else:
        for i in range(config.n_layer):
            x = _block(params[f"h{i}"], x, config.n_head)
    x = _layernorm(x, params["ln_f"])
    return x[:, 0] @ params["fc"]["W"] + params["fc"]["b"]


def stack_vit_blocks(params, config: ViTConfig):
    """Convert unrolled ``h0..h{n-1}`` block params to a scan-stacked ``h``."""
    blocks = [params[f"h{i}"] for i in range(config.n_layer)]
    stacked = {k: v for k, v in params.items() if not k.startswith("h")}
    stacked["h"] = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    return stacked


def init_vit(key, config: ViTConfig, dtype=jnp.float32):
    """Initialize the ViT parameter pytree."""
    C, P = config.n_embd, config.patch_size
    keys = jax.random.split(key, config.n_layer + 5)
    fan_in = P * P * config.in_channels
    params = {
        "conv_patch": {
            "W": lecun_normal(keys[0], (P, P, config.in_channels, C), fan_in, dtype),
            "b": jnp.zeros(C, dtype),
        },
        "cls": 0.02 * jax.random.normal(keys[1], (1, 1, C), dtype),
        "pos": 0.02
        * jax.random.normal(keys[2], (1, config.n_patches + 1, C), dtype),
        "ln_f": {"scale": jnp.ones(C, dtype), "bias": jnp.zeros(C, dtype)},
        "fc": {
            "W": lecun_normal(keys[3], (C, config.num_classes), C, dtype),
            "b": jnp.zeros(config.num_classes, dtype),
        },
    }
    for i in range(config.n_layer):
        k = jax.random.split(keys[4 + i], 4)
        params[f"h{i}"] = {
            "ln1": {"scale": jnp.ones(C, dtype), "bias": jnp.zeros(C, dtype)},
            "ln2": {"scale": jnp.ones(C, dtype), "bias": jnp.zeros(C, dtype)},
            "attn_qkv": {
                "W": lecun_normal(k[0], (C, 3 * C), C, dtype),
                "b": jnp.zeros(3 * C, dtype),
            },
            "attn_proj": {
                "W": lecun_normal(k[1], (C, C), C, dtype),
                "b": jnp.zeros(C, dtype),
            },
            "mlp_fc": {
                "W": lecun_normal(k[2], (C, 4 * C), C, dtype),
                "b": jnp.zeros(4 * C, dtype),
            },
            "mlp_proj": {
                "W": lecun_normal(k[3], (4 * C, C), 4 * C, dtype),
                "b": jnp.zeros(C, dtype),
            },
        }
    return params


def cifar10_vit(
    batch_size: int = 512,
    config: ViTConfig | None = None,
    seed: int = 0,
    dtype=jnp.float32,
    scan_blocks: bool = False,
) -> Problem:
    """ViT-S/4 on synthetic CIFAR-10 (32x32x3, 10 classes).

    ``scan_blocks=True`` stacks the encoder blocks into one ``lax.scan``."""
    config = config or ViTConfig()
    key = jax.random.key(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_vit(kp, config, dtype)
    if scan_blocks:
        params = stack_vit_blocks(params, config)
    X = jax.random.uniform(
        kx,
        (batch_size, config.image_size, config.image_size, config.in_channels),
        dtype,
    )
    y = jax.random.randint(ky, (batch_size,), 0, config.num_classes)
    apply_fn = partial(vit_apply, config=config)
    kfac_fn, kfac_params = kfac_restricted(apply_fn, params)
    return Problem(
        "synthetic_cifar10_vit",
        apply_fn,
        CrossEntropyLoss("mean"),
        params,
        [(X, y)],
        kfac_fn,
        kfac_params,
    )


TINY_VIT = ViTConfig(
    image_size=8, patch_size=4, n_layer=2, n_head=2, n_embd=16, num_classes=5
)
