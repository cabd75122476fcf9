"""Model zoo: shapes, curvature-operator compatibility, KFAC layer discovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import (
    GGNLinearOperator,
    HessianLinearOperator,
    KFACLinearOperator,
)
from curvlinops_tpu.models import (
    TINY_GPT,
    cifar10_resnet18,
    gpt_apply,
    init_gpt,
    kfac_restricted,
    mnist_mlp,
    shakespeare_nanogpt,
)
from curvlinops_tpu.models.gpt import GPTConfig
from curvlinops_tpu.models.resnet import init_resnet, resnet_apply

from functools import partial


def test_mlp_problem():
    prob = mnist_mlp(batch_size=8)
    X, y = prob.data[0]
    logits = prob.model_fn(prob.params, X)
    assert logits.shape == (8, 10)
    G = GGNLinearOperator(
        prob.model_fn, prob.loss_fn, prob.params, prob.data,
        check_deterministic=False,
    )
    v = np.random.default_rng(0).standard_normal(G.shape[0]).astype(np.float32)
    assert np.isfinite(G @ v).all()


def test_resnet18_tiny_forward_and_ggn():
    # tiny spatial input keeps the test fast; architecture is the real one
    key = jax.random.key(0)
    params = init_resnet(key, "resnet18", 10)
    apply_fn = partial(resnet_apply, block="basic")
    X = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    y = jax.random.randint(jax.random.key(2), (2,), 0, 10)
    logits = apply_fn(params, X)
    assert logits.shape == (2, 10)

    G = GGNLinearOperator(
        apply_fn, cifar10_resnet18(batch_size=2).loss_fn, params, [(X, y)],
        check_deterministic=False,
    )
    v_tree = jax.tree.map(jnp.zeros_like, params)
    out = G.matvec_tree(v_tree)  # zero in, zero out (smoke)
    assert all(float(jnp.abs(leaf).max()) == 0 for leaf in jax.tree.leaves(out))


def test_resnet18_kfac_layer_discovery():
    prob = cifar10_resnet18(batch_size=2)
    kfac = KFACLinearOperator(
        prob.kfac_model_fn,
        prob.loss_fn,
        prob.kfac_params,
        prob.data,
        fisher_type="mc",
        mc_samples=1,
        check_deterministic=False,
    )
    kinds = [u.kind for g in kfac.groups for u in g.uses if g.weight_path]
    assert kinds.count("conv") >= 19, "all resnet18 convs must be discovered"
    assert "dense" in kinds, "the fc layer must be discovered"
    v = np.random.default_rng(1).standard_normal(kfac.shape[0]).astype(np.float32)
    assert np.isfinite(kfac @ v).all()


def test_tiny_gpt_forward_and_kfac():
    config = TINY_GPT
    params = init_gpt(jax.random.key(0), config)
    apply_fn = partial(gpt_apply, config=config)
    B, T = 2, config.block_size
    tokens = jax.random.randint(jax.random.key(1), (B, T), 0, config.vocab_size)
    logits = apply_fn(params, tokens)
    assert logits.shape == (B * T, config.vocab_size)

    from curvlinops_tpu import CrossEntropyLoss

    y = jax.random.randint(jax.random.key(2), (B * T,), 0, config.vocab_size)
    data = [(tokens, y)]

    # Hessian over ALL params (embeddings, layernorms included)
    H = HessianLinearOperator(
        apply_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    v = np.random.default_rng(2).standard_normal(H.shape[0]).astype(np.float32)
    assert np.isfinite(H @ v).all()

    # KFAC over the dense subset (qkv/proj/fc discovered; ln/wte/wpe closed over)
    kfac_fn, kfac_params = kfac_restricted(apply_fn, params)
    kfac = KFACLinearOperator(
        kfac_fn,
        CrossEntropyLoss("mean"),
        kfac_params,
        data,
        fisher_type="mc",
        mc_samples=1,
        check_deterministic=False,
    )
    n_weight_groups = sum(1 for g in kfac.groups if g.weight_path is not None)
    assert n_weight_groups == 4 * config.n_layer  # qkv, proj, fc, mlp_proj / layer
    v = np.random.default_rng(3).standard_normal(kfac.shape[0]).astype(np.float32)
    assert np.isfinite(kfac @ v).all()


def test_tiny_vit_forward_ggn_and_kfac():
    """ViT: conv patch embedding + dense attention blocks in ONE model —
    KFAC must discover BOTH layer kinds from the same jaxpr; GGN matches
    the dense ground truth computed from the Jacobian."""
    from curvlinops_tpu import CrossEntropyLoss
    from curvlinops_tpu.models import TINY_VIT, init_vit, vit_apply
    from curvlinops_tpu.examples import dense_ggn

    config = TINY_VIT
    params = init_vit(jax.random.key(0), config)
    apply_fn = partial(vit_apply, config=config)
    B = 3
    X = jax.random.uniform(
        jax.random.key(1), (B, config.image_size, config.image_size, 3)
    )
    y = jax.random.randint(jax.random.key(2), (B,), 0, config.num_classes)
    logits = apply_fn(params, X)
    assert logits.shape == (B, config.num_classes)
    data = [(X, y)]
    loss = CrossEntropyLoss("mean")

    # GGN over ALL params (conv, cls token, pos embedding, layernorms) vs
    # the dense ground truth
    G = GGNLinearOperator(
        apply_fn, loss, params, data, check_deterministic=False
    )
    dense = np.asarray(G.todense())
    truth = dense_ggn(apply_fn, loss, params, data)
    np.testing.assert_allclose(dense, np.asarray(truth), rtol=1e-4, atol=1e-6)

    # KFAC over the conv+dense subset: the patch conv AND every block's
    # qkv/proj/mlp pair AND the head must be discovered
    kfac_fn, kfac_params = kfac_restricted(apply_fn, params)
    kfac = KFACLinearOperator(
        kfac_fn,
        loss,
        kfac_params,
        data,
        fisher_type="mc",
        mc_samples=1,
        check_deterministic=False,
    )
    n_weight_groups = sum(1 for g in kfac.groups if g.weight_path is not None)
    assert n_weight_groups == 4 * config.n_layer + 2  # blocks + conv + fc
    kinds = {u.kind for g in kfac.groups for u in g.uses}
    assert "conv" in kinds and "dense" in kinds
    v = np.random.default_rng(3).standard_normal(kfac.shape[0]).astype(np.float32)
    assert np.isfinite(kfac @ v).all()
    inv = kfac.inverse(damping=1e-1)
    assert np.isfinite(inv @ v).all()


def test_vit_problem_constructs():
    from curvlinops_tpu.models import cifar10_vit

    prob = cifar10_vit(batch_size=2, config=None)
    X, y = prob.data[0]
    assert prob.model_fn(prob.params, X).shape == (2, 10)
    # restricted set froze cls/pos/layernorms
    assert not any("cls" in k or "pos" in k or "ln" in k for k in prob.kfac_params)


def test_vit_scan_stacked_matches_unrolled():
    """Scan-stacked ViT blocks: same forward, and KFAC discovers the conv
    patch embedding (unstacked) alongside the stacked dense groups."""
    from curvlinops_tpu import CrossEntropyLoss
    from curvlinops_tpu.models import TINY_VIT, init_vit, vit_apply
    from curvlinops_tpu.models.vit import stack_vit_blocks

    config = TINY_VIT
    params = init_vit(jax.random.key(0), config)
    stacked = stack_vit_blocks(params, config)
    X = jax.random.uniform(
        jax.random.key(1), (2, config.image_size, config.image_size, 3)
    )
    apply_fn = partial(vit_apply, config=config)
    np.testing.assert_allclose(
        np.asarray(apply_fn(params, X)),
        np.asarray(apply_fn(stacked, X)),
        rtol=2e-5,
        atol=1e-6,
    )

    y = jax.random.randint(jax.random.key(2), (2,), 0, config.num_classes)
    kfac_fn, kfac_params = kfac_restricted(apply_fn, stacked)
    kfac = KFACLinearOperator(
        kfac_fn,
        CrossEntropyLoss("mean"),
        kfac_params,
        [(X, y)],
        fisher_type="mc",
        mc_samples=1,
        check_deterministic=False,
    )
    stacks = {g.stack for g in kfac.groups if g.weight_path is not None}
    assert config.n_layer in stacks  # dense block groups batched over layers
    assert 0 in stacks  # conv patch embedding + head stay unstacked
    v = np.random.default_rng(5).standard_normal(kfac.shape[0]).astype(np.float32)
    assert np.isfinite(kfac @ v).all()


def test_nanogpt_problem_constructs_tiny():
    prob = shakespeare_nanogpt(batch_size=2, config=GPTConfig(
        block_size=8, vocab_size=16, n_layer=1, n_head=2, n_embd=8
    ))
    X, y = prob.data[0]
    assert prob.model_fn(prob.params, X).shape == (2 * 8, 16)
    assert y.shape == (2 * 8,)


def test_frozen_params_not_captured_as_constants():
    """FrozenModelFn keeps big frozen arrays out of kernel HLO constants."""
    import warnings
    from functools import partial

    from curvlinops_tpu import CrossEntropyLoss
    from curvlinops_tpu.kfac.computer import KFACComputer

    config = GPTConfig(block_size=8, vocab_size=8192, n_layer=1, n_head=2,
                       n_embd=32)  # frozen wte+lm_head ~ 2 MB
    params = init_gpt(jax.random.key(0), config)
    apply_fn = partial(gpt_apply, config=config)
    kfac_fn, kfac_params = kfac_restricted(apply_fn, params)
    tokens = jax.random.randint(jax.random.key(1), (2, 8), 0, config.vocab_size)
    y = jax.random.randint(jax.random.key(2), (16,), 0, config.vocab_size)

    comp = KFACComputer(
        kfac_fn, CrossEntropyLoss("mean"), kfac_params, [(tokens, y)],
        fisher_type="mc", mc_samples=1, check_deterministic=False,
        use_pallas=False,
    )
    old = jax.config.jax_captured_constants_warn_bytes
    try:
        jax.config.update("jax_captured_constants_warn_bytes", 500_000)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            kernel = comp._get_kernel(tokens)
            out = kernel(comp.params, tokens, y, jax.random.key(3),
                         jnp.float32(1.0))
            jax.block_until_ready(out)
        captures = [w for w in caught if "constants were captured" in str(w.message)]
        assert not captures, [str(w.message) for w in captures]
    finally:
        jax.config.update("jax_captured_constants_warn_bytes", old)


def test_kfac_on_huggingface_flax_vit():
    """KFAC on an UNMODIFIED HuggingFace FlaxViT: the conv patch embedding
    AND the attention/MLP/classifier dense layers are discovered from the
    flax-linen jaxpr (layernorms, CLS token, position embeddings frozen)."""
    pytest.importorskip("transformers")
    from transformers import FlaxViTForImageClassification, ViTConfig

    import jax.tree_util as jtu
    from curvlinops_tpu import CrossEntropyLoss, KFACLinearOperator
    from curvlinops_tpu.utils.misc import FrozenModelFn

    cfg = ViTConfig(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, image_size=8, patch_size=4, num_channels=3,
        num_labels=5,
    )
    model = FlaxViTForImageClassification(cfg, seed=0)
    params = model.params

    def base_fn(p, x):
        return model(pixel_values=x, params=p).logits

    flat, treedef = jtu.tree_flatten_with_path(params)

    def is_kfac(path):
        ks = "/".join(str(getattr(k, "key", k)) for k in path)
        if "layernorm" in ks or "cls_token" in ks or "position_embeddings" in ks:
            return False
        return any(
            name in ks
            for name in ("projection", "query", "key", "value", "dense",
                         "classifier")
        )

    kfac_flat = {jtu.keystr(p): l for p, l in flat if is_kfac(p)}
    frozen_flat = {jtu.keystr(p): l for p, l in flat if not is_kfac(p)}

    def raw_fn(frozen, kp, x):
        leaves = [
            kp[jtu.keystr(p)] if jtu.keystr(p) in kp else frozen[jtu.keystr(p)]
            for p, _ in flat
        ]
        return base_fn(jtu.tree_unflatten(treedef, leaves), x)

    kfac_fn = FrozenModelFn(raw_fn, frozen_flat)
    X = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 8, 8)), jnp.float32
    )
    y = jnp.asarray(np.random.default_rng(1).integers(0, 5, (2,)))
    kfac = KFACLinearOperator(
        kfac_fn, CrossEntropyLoss("mean"), kfac_flat, [(X, y)],
        fisher_type="mc", mc_samples=1, check_deterministic=False,
    )
    kinds = {u.kind for g in kfac.groups for u in g.uses}
    assert kinds == {"conv", "dense"}
    # q/k/v + attn-out + intermediate + output + patch conv + classifier
    n_weight_groups = sum(1 for g in kfac.groups if g.weight_path is not None)
    assert n_weight_groups == 8
    v = np.random.default_rng(3).standard_normal(kfac.shape[0]).astype(np.float32)
    assert np.isfinite(kfac @ v).all()
    inv = kfac.inverse(damping=1e-1, use_exact_damping=True)
    assert np.isfinite(inv @ v).all()


def test_kfac_on_huggingface_flax_gpt2():
    """KFAC on an UNMODIFIED HuggingFace FlaxGPT2 (Conv1D kernel transposes
    handled by the collector's weight-view tracking)."""
    transformers = pytest.importorskip("transformers")
    from transformers import FlaxGPT2LMHeadModel, GPT2Config

    import jax.tree_util as jtu
    from curvlinops_tpu import CrossEntropyLoss, KFACLinearOperator
    from curvlinops_tpu.utils.misc import FrozenModelFn

    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=16, vocab_size=64,
                     n_positions=16)
    model = FlaxGPT2LMHeadModel(cfg, seed=0)
    params = model.params

    def base_fn(p, x):
        out = model(input_ids=x, params=p)
        return out.logits.reshape(-1, out.logits.shape[-1])

    flat, treedef = jtu.tree_flatten_with_path(params)

    def is_kfac(path):
        ks = "/".join(str(getattr(k, "key", k)) for k in path)
        return "c_attn" in ks or "c_proj" in ks or "c_fc" in ks

    kfac_flat = {jtu.keystr(p): l for p, l in flat if is_kfac(p)}
    frozen_flat = {jtu.keystr(p): l for p, l in flat if not is_kfac(p)}

    def raw_fn(frozen, kp, x):
        leaves = [
            kp[jtu.keystr(p)] if jtu.keystr(p) in kp else frozen[jtu.keystr(p)]
            for p, _ in flat
        ]
        return base_fn(jtu.tree_unflatten(treedef, leaves), x)

    kfac_fn = FrozenModelFn(raw_fn, frozen_flat)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 8)))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 64, (16,)))
    kfac = KFACLinearOperator(
        kfac_fn, CrossEntropyLoss("mean"), kfac_flat, [(tokens, y)],
        fisher_type="mc", mc_samples=1, check_deterministic=False,
    )
    assert len(kfac.groups) == 8  # 4 Conv1D layers x (W, b)
    # every weight carries the HF Conv1D transpose view
    for g in kfac.groups:
        if g.weight_path is not None:
            assert any(v[0] == "transpose" for v in g.uses[0].meta["w_views"])
    v = np.random.default_rng(2).standard_normal(kfac.shape[0]).astype(np.float32)
    assert np.isfinite(kfac @ v).all()
    P, PT = kfac.ops[0], kfac.ops[2]
    np.testing.assert_allclose(
        np.asarray(P @ (PT @ v)), v, rtol=1e-5, atol=1e-6
    )


def test_gpt_attention_fused_matches_einsum():
    """jax.nn.dot_product_attention ('fused') must equal the einsum-softmax
    path — same weights, same forward, same GGN matvec."""
    from dataclasses import replace

    config = TINY_GPT
    params = init_gpt(jax.random.key(0), config)
    tokens = jax.random.randint(
        jax.random.key(1), (2, config.block_size), 0, config.vocab_size
    )
    out_einsum = gpt_apply(params, tokens, config=config)
    out_fused = gpt_apply(
        params, tokens, config=replace(config, attention_impl="fused")
    )
    np.testing.assert_allclose(
        np.asarray(out_einsum), np.asarray(out_fused), rtol=2e-5, atol=2e-5
    )

    from curvlinops_tpu import CrossEntropyLoss

    y = jax.random.randint(
        jax.random.key(2), (2 * config.block_size,), 0, config.vocab_size
    )
    v = np.random.default_rng(0)
    ops = []
    for impl in ["einsum", "fused"]:
        cfg = replace(config, attention_impl=impl)
        ops.append(GGNLinearOperator(
            partial(gpt_apply, config=cfg), CrossEntropyLoss("mean"),
            params, [(tokens, y)], check_deterministic=False,
        ))
    vec = v.standard_normal(ops[0].shape[0]).astype(np.float32)
    np.testing.assert_allclose(
        ops[0] @ vec, ops[1] @ vec, rtol=1e-4, atol=1e-5
    )
