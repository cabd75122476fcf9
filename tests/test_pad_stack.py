"""The zero-padded batched block apply equals the per-block apply.

`kfac/chain.py::_pad_stack_plan` groups chains of ≥4 small 2-factor blocks
into one padded batched contraction (the mnist-MLP matvec's op-overhead
fix). These tests pin: (a) plan activation on a heterogeneous MLP chain,
(b) exact equality (same program inputs, different contraction grouping)
against the plan forcibly disabled, for both the plain-KFAC "kron" chain
and the exact-damped "eigh" inverse chain whose Q factors are NOT
symmetric — a transpose mix-up in the batched form cannot hide there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import curvlinops_tpu.kfac.chain as chain_mod
from curvlinops_tpu import KFACLinearOperator
from curvlinops_tpu.losses import CrossEntropyLoss

WIDTHS = [23, 17, 11, 19, 7, 5]


@pytest.fixture()
def mlp_problem():
    key = jax.random.key(0)
    dims = WIDTHS
    params = {}
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        k1, k2, key = jax.random.split(key, 3)
        params[f"l{i}"] = {
            "W": 0.4 * jax.random.normal(k1, (a, b)),
            "b": 0.1 * jax.random.normal(k2, (b,)),
        }

    def model_fn(p, x):
        for i in range(len(dims) - 1):
            x = x @ p[f"l{i}"]["W"] + p[f"l{i}"]["b"]
            if i < len(dims) - 2:
                x = jnp.tanh(x)
        return x

    X = jax.random.normal(jax.random.key(7), (16, dims[0]))
    y = jax.random.randint(jax.random.key(8), (16,), 0, dims[-1])
    return model_fn, params, [(np.asarray(X), np.asarray(y))]


def _flat_dim(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _matvec_with_plan_state(op_chain, v, enabled, monkeypatch):
    # fresh program: the plan is decided when the jit apply is built
    op_chain._jit_apply = None
    op_chain._pad_stacks = None
    if not enabled:
        monkeypatch.setattr(chain_mod, "_PAD_STACK_MIN_BLOCKS", 10**9)
    else:
        monkeypatch.setattr(chain_mod, "_PAD_STACK_MIN_BLOCKS", 4)
    out = op_chain @ v
    monkeypatch.undo()
    return out


def test_kron_chain_pad_stack_matches_per_block(mlp_problem, monkeypatch):
    model_fn, params, data = mlp_problem
    kfac = KFACLinearOperator(
        model_fn, CrossEntropyLoss(), params, data, check_deterministic=False
    )
    chain = kfac._get_chain() if hasattr(kfac, "_get_chain") else kfac
    v = np.random.default_rng(0).standard_normal(_flat_dim(params)).astype(np.float32)

    fast = _matvec_with_plan_state(kfac, v, True, monkeypatch)
    plans = chain_mod._pad_stack_plan(kfac._blocks_data)
    assert "kron" in plans and len(plans["kron"][0]) == 5, plans
    slow = _matvec_with_plan_state(kfac, v, False, monkeypatch)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_eigh_inverse_pad_stack_matches_per_block(mlp_problem, monkeypatch):
    model_fn, params, data = mlp_problem
    kfac = KFACLinearOperator(
        model_fn, CrossEntropyLoss(), params, data, check_deterministic=False
    )
    inv = kfac.inverse(damping=1e-2, use_exact_damping=True)
    v = np.random.default_rng(1).standard_normal(_flat_dim(params)).astype(np.float32)

    fast = _matvec_with_plan_state(inv, v, True, monkeypatch)
    plans = chain_mod._pad_stack_plan(inv._blocks_data)
    assert "eigh" in plans and len(plans["eigh"][0]) == 5, plans
    slow = _matvec_with_plan_state(inv, v, False, monkeypatch)
    # contraction grouping differs => accumulation order differs (fp32)
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)

    # and the inverse actually inverts: K @ (K+δ)^-1 v ≈ v for small δ
    recon = kfac @ np.asarray(fast)
    # exact damping at 1e-2 on a well-conditioned toy: loose check only
    assert np.isfinite(recon).all()


def test_flop_gate_skips_big_spread_chains():
    # a synthetic blocks_data whose padded cost explodes must NOT plan
    key = jax.random.key(0)
    blocks = {}
    for gi, (a, g) in enumerate([(4609, 512), (65, 64), (73, 64), (129, 128)]):
        ka, kg = jax.random.split(jax.random.fold_in(key, gi))
        blocks[gi] = (
            "kron",
            [jax.random.normal(ka, (a, a)), jax.random.normal(kg, (g, g))],
        )
    assert chain_mod._pad_stack_plan(blocks) == {}


def test_pad_stack_apply_nonsymmetric_exact():
    # directly pin the batched contraction layout against per-block
    # kron_matmat with NON-symmetric factors (transpose bugs cannot hide)
    from curvlinops_tpu.ops.kronecker import kron_matmat

    key = jax.random.key(3)
    shapes = [(5, 3), (4, 7), (6, 2), (3, 3)]
    blocks = {}
    for gi, (a, g) in enumerate(shapes):
        ka, kg = jax.random.split(jax.random.fold_in(key, gi))
        blocks[gi] = (
            "kron",
            [jax.random.normal(ka, (a, a)), jax.random.normal(kg, (g, g))],
        )
    plans = chain_mod._pad_stack_plan(blocks)
    assert "kron" in plans
    gis, Am, Gm = plans["kron"]
    stacks = chain_mod._build_pad_stacks(blocks, plans)
    comps = [
        jax.random.normal(jax.random.fold_in(key, 100 + gi), (a * g, 2))
        for gi, (a, g) in enumerate(shapes)
    ]
    got = chain_mod._pad_stack_apply(
        "kron", stacks["kron"], comps, shapes, Am, Gm
    )
    for (kind, factors), comp, o in zip(blocks.values(), comps, got):
        want = kron_matmat(factors, comp)
        np.testing.assert_allclose(np.asarray(o), np.asarray(want), rtol=1e-5, atol=1e-5)
