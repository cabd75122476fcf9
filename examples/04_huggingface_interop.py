"""Worked example: curvature operators on an unmodified HuggingFace model.

Counterpart of the reference's ``example_huggingface.py``: GGN matvecs over
ALL parameters of a Flax GPT-2, and KFAC over its transformer dense layers —
the jaxpr collector discovers HF's Conv1D layers on the stock model (their
kernel transposes are tracked as weight views; no tagging, no wrappers).

Run: ``python examples/04_huggingface_interop.py``
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import curvlinops_tpu as cl
from curvlinops_tpu.utils.misc import FrozenModelFn


def main():
    from transformers import FlaxGPT2LMHeadModel, GPT2Config

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=128,
                     n_positions=32)
    model = FlaxGPT2LMHeadModel(cfg, seed=0)
    params = model.params

    def model_fn(p, x):
        out = model(input_ids=x, params=p)
        return out.logits.reshape(-1, out.logits.shape[-1])

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (32,)))
    data = [(tokens, y)]
    loss_fn = cl.CrossEntropyLoss("mean")

    # GGN over ALL parameters (embeddings, layer norms, everything)
    G = cl.GGNLinearOperator(model_fn, loss_fn, params, data,
                             check_deterministic=False)
    v = rng.standard_normal(G.shape[0]).astype(np.float32)
    print(f"GGN over the full GPT-2 parameter space ({G.shape[0]} params):")
    print("  ||Gv|| =", float(np.linalg.norm(G @ v)))

    # KFAC over the Conv1D (attention/MLP) layers; the rest is frozen
    flat, treedef = jtu.tree_flatten_with_path(params)

    def is_kfac(path):
        ks = "/".join(str(getattr(k, "key", k)) for k in path)
        return "c_attn" in ks or "c_proj" in ks or "c_fc" in ks

    kfac_params = {jtu.keystr(p): l for p, l in flat if is_kfac(p)}
    frozen = {jtu.keystr(p): l for p, l in flat if not is_kfac(p)}

    def raw_fn(frozen, kp, x):
        leaves = [
            kp[jtu.keystr(p)] if jtu.keystr(p) in kp else frozen[jtu.keystr(p)]
            for p, _ in flat
        ]
        return model_fn(jtu.tree_unflatten(treedef, leaves), x)

    kfac = cl.KFACLinearOperator(
        FrozenModelFn(raw_fn, frozen), loss_fn, kfac_params, data,
        fisher_type="mc", mc_samples=1, check_deterministic=False,
    )
    weight_groups = [g.name for g in kfac.groups if g.weight_path]
    print(f"KFAC groups discovered on the stock model: {weight_groups}")
    # the jaxpr collector must find every dense sublayer of the stock
    # transformer block (2 blocks x [attn qkv, attn proj, mlp in, mlp out])
    assert len(weight_groups) == 8, weight_groups
    w = rng.standard_normal(kfac.shape[0]).astype(np.float32)
    nat = kfac.inverse(damping=1e-2, use_exact_damping=True) @ w
    nat_norm = float(np.linalg.norm(nat))
    print("  KFAC-preconditioned vector norm:", nat_norm)
    assert np.isfinite(nat_norm) and nat_norm > 0


if __name__ == "__main__":
    main()
