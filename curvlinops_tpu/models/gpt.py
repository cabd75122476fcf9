"""nanoGPT-class decoder-only transformer in pure JAX.

Counterpart of the reference's ``synthetic_shakespeare_nanogpt`` benchmark
problem (``docs/examples/basic_usage/benchmark_utils.py:341-378``): default
GPT-2-small geometry (12 layers, 12 heads, 768 dim, block 1024, vocab 50304,
~124M parameters — the "100M-param transformer" of the north-star target),
weight tying removed, logits flattened to ``[(B*T), V]`` for cross-entropy.

TPU-first choices: all dense layers are plain ``x @ W + b`` dot_generals (so
the KFAC jaxpr collector finds them on the unmodified model), attention is a
batched einsum softmax (never a parameter use), and layer norms keep their
parameters out of the KFAC set via :func:`curvlinops_tpu.models.resnet.kfac_restricted`.
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
class GPTConfig:
    """Model geometry (defaults = nanoGPT's GPT-2 small).

    ``attention_impl`` (A/B'd on a v5e chip, benchmarks/RESULTS.md):

    - ``"einsum"`` (default): explicit einsum-softmax with a tril mask. XLA
      fuses it well — fastest differentiable-in-both-modes form measured
      (bf16 GGN-VP 69 ms vs 88 ms for "fused").
    - ``"fused"``: ``jax.nn.dot_product_attention``. fp32 parity with
      einsum, but ~27% slower in bf16 (internal f32 softmax upcasts).
    - ``"flash"``: Pallas TPU flash attention — no [T, T] HBM traffic, but
      its custom_vjp is reverse-mode ONLY: gradient and KFAC/EKFAC factor
      builds work; anything needing jvp (Hessian, GGN, MC-Fisher, and this
      library's EF-VP, which computes Jv forward-mode) refuses.
    """

    block_size: int = 1024
    vocab_size: int = 50304
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    attention_impl: str = "einsum"


def _layernorm(x, p):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return p["scale"] * (x - mean) * jax.lax.rsqrt(var + 1e-5) + p["bias"]


def _attention(params, x, n_head, impl: str = "einsum"):
    B, T, C = x.shape
    qkv = x @ params["attn_qkv"]["W"] + params["attn_qkv"]["b"]  # [B, T, 3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = C // n_head

    if impl == "flash":
        # Pallas TPU flash attention (jax.experimental.pallas.ops.tpu):
        # never materializes [T, T] score tensors in HBM. Its custom_vjp is
        # reverse-mode ONLY — gradient and KFAC/EKFAC builds work; kernels
        # that need jvp (Hessian/GGN/MC-Fisher/EF-VP) refuse — use
        # "einsum"/"fused" for those.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        def heads_bhtd(t):
            return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)

        out = flash_attention(
            heads_bhtd(q),
            heads_bhtd(k),
            heads_bhtd(v),
            causal=True,
            sm_scale=1.0 / float(hd) ** 0.5,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    elif impl == "fused":
        # XLA's fused causal attention: no [T, T] mask materialization, and
        # jvp/vjp both flow (Hessian = jvp-of-grad needs forward mode)
        def heads_btnh(t):
            return t.reshape(B, T, n_head, hd)

        out = jax.nn.dot_product_attention(
            heads_btnh(q), heads_btnh(k), heads_btnh(v), is_causal=True
        )
        out = out.reshape(B, T, C)
    else:

        def heads(t):
            return t.reshape(B, T, n_head, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype)
        )
        mask = jnp.tril(jnp.ones((T, T), bool))
        att = jnp.where(mask, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return out @ params["attn_proj"]["W"] + params["attn_proj"]["b"]


def _block(params, x, n_head, impl: str = "einsum"):
    x = x + _attention(params, _layernorm(x, params["ln1"]), n_head, impl)
    h = _layernorm(x, params["ln2"])
    h = jax.nn.gelu(h @ params["mlp_fc"]["W"] + params["mlp_fc"]["b"])
    return x + (h @ params["mlp_proj"]["W"] + params["mlp_proj"]["b"])


def gpt_apply(
    params, tokens, *, config: GPTConfig, remat_blocks: bool = True
) -> jax.Array:
    """Forward pass ``[B, T] int tokens -> [(B*T), vocab] flattened logits.

    Accepts either per-layer block params (``h0..h{n-1}`` keys, unrolled
    Python loop) or scan-stacked block params (one ``h`` subtree whose leaves
    carry a leading ``n_layer`` axis, applied with ``lax.scan`` — the
    idiomatic TPU layer stack: one compiled block body instead of ``n_layer``
    inlined copies, and KFAC factors batched over the stack).

    ``remat_blocks`` checkpoints the scanned block body (standard TPU
    practice: reverse-mode through a scan otherwise keeps every iteration's
    internals alive at once — HVP/GGN-VP kernels on the 124M model OOM a
    single v5e chip without it). The KFAC collector inlines the remat
    transparently.
    """
    B, T = tokens.shape
    pos = jnp.arange(T)
    x = params["wte"][tokens] + params["wpe"][pos]
    impl = config.attention_impl
    if "h" in params:  # scan-stacked blocks

        def body(h, block_params):
            return _block(block_params, h, config.n_head, impl), None

        if remat_blocks:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, params["h"])
    else:
        for i in range(config.n_layer):
            x = _block(params[f"h{i}"], x, config.n_head, impl)
    x = _layernorm(x, params["ln_f"])
    logits = x @ params["lm_head"]["W"]
    return logits.reshape(B * T, -1)


def stack_gpt_blocks(params, config: GPTConfig):
    """Convert unrolled ``h0..h{n-1}`` block params to a scan-stacked ``h``."""
    blocks = [params[f"h{i}"] for i in range(config.n_layer)]
    stacked = {k: v for k, v in params.items() if not k.startswith("h")}
    stacked["h"] = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    return stacked


def init_gpt(key, config: GPTConfig, dtype=jnp.float32):
    """Initialize the GPT parameter pytree (no weight tying)."""
    C, V = config.n_embd, config.vocab_size
    keys = jax.random.split(key, config.n_layer + 4)
    params = {
        "wte": 0.02 * jax.random.normal(keys[0], (V, C), dtype),
        "wpe": 0.01 * jax.random.normal(keys[1], (config.block_size, C), dtype),
        "ln_f": {"scale": jnp.ones(C, dtype), "bias": jnp.zeros(C, dtype)},
        "lm_head": {"W": lecun_normal(keys[2], (C, V), C, dtype)},
    }
    for i in range(config.n_layer):
        k = jax.random.split(keys[3 + i], 4)
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


def shakespeare_nanogpt(
    batch_size: int = 4,
    config: GPTConfig | None = None,
    seed: int = 0,
    dtype=jnp.float32,
    scan_blocks: bool = False,
    attention_impl: str | None = None,
) -> Problem:
    """Synthetic-Shakespeare nanoGPT problem (random tokens, next-token CE).

    ``scan_blocks=True`` stacks the transformer blocks into one ``lax.scan``
    (same math, one traced block body, KFAC factors batched over layers).
    ``attention_impl`` overrides the config's attention implementation
    (``"flash"`` = Pallas TPU kernel, reverse-mode only).
    """
    config = config or GPTConfig()
    if attention_impl is not None:
        from dataclasses import replace

        config = replace(config, attention_impl=attention_impl)
    key = jax.random.key(seed)
    kp, kd = jax.random.split(key)
    params = init_gpt(kp, config, dtype)
    if scan_blocks:
        params = stack_gpt_blocks(params, config)
    T = config.block_size
    tokens = jax.random.randint(kd, (batch_size, T + 1), 0, config.vocab_size)
    X, y = tokens[:, :T], tokens[:, 1:].reshape(-1)
    apply_fn = partial(gpt_apply, config=config)
    kfac_fn, kfac_params = kfac_restricted(apply_fn, params)
    return Problem(
        "synthetic_shakespeare_nanogpt",
        apply_fn,
        CrossEntropyLoss("mean"),
        params,
        [(X, y)],
        kfac_fn,
        kfac_params,
    )


TINY_GPT = GPTConfig(block_size=16, vocab_size=32, n_layer=2, n_head=2, n_embd=16)
