"""bfloat16 end-to-end smoke: dtype propagation through the operator stack.

The TPU speed mode runs models/params in bf16 (benchmarks ``--dtype
bfloat16``); these CPU tests pin the dtype PLUMBING — kernels must neither
crash (e.g. scan carries pinned to the wrong dtype) nor silently upcast the
compute path — while numeric agreement with f32 is only checked loosely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import curvlinops_tpu as cl


def _problem(dtype):
    key = jax.random.key(0)
    params = {
        "W1": (0.4 * jax.random.normal(key, (6, 16))).astype(dtype),
        "b1": jnp.zeros(16, dtype),
        "W2": (0.4 * jax.random.normal(jax.random.key(1), (16, 4))).astype(dtype),
    }

    def model_fn(p, x):
        return jnp.tanh(x @ p["W1"] + p["b1"]) @ p["W2"]

    X = jax.random.normal(jax.random.key(2), (24, 6)).astype(dtype)
    y = jax.random.randint(jax.random.key(3), (24,), 0, 4)
    # two batches so the fused multi-batch accumulation path runs
    data = [(X[:12], y[:12]), (X[12:], y[12:])]
    return model_fn, params, data


@pytest.mark.parametrize("op_cls", [
    cl.GGNLinearOperator, cl.HessianLinearOperator, cl.EFLinearOperator,
])
def test_bf16_matvec_dtype_and_magnitude(op_cls):
    model_fn, params, data = _problem(jnp.bfloat16)
    loss = cl.CrossEntropyLoss("mean")
    op = op_cls(model_fn, loss, params, data, check_deterministic=False)
    v = jax.tree.map(lambda p: jnp.ones_like(p), params)
    out = op.matvec_tree(v)
    for leaf in jax.tree.leaves(out):
        assert leaf.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(leaf.astype(jnp.float32)).all())

    # loose agreement with the f32 operator (bf16 has ~3 decimal digits)
    model32, params32, data32 = _problem(jnp.float32)
    op32 = op_cls(model32, loss, params32, data32, check_deterministic=False)
    a = np.concatenate(
        [np.ravel(np.asarray(l, np.float32)) for l in jax.tree.leaves(out)]
    )
    b = np.concatenate(
        [np.ravel(np.asarray(l))
         for l in jax.tree.leaves(op32.matvec_tree(
             jax.tree.map(jnp.ones_like, params32)))]
    )
    denom = np.linalg.norm(b) + 1e-12
    assert np.linalg.norm(a - b) / denom < 0.05


def test_bf16_gradient_and_loss_fused():
    """The fused full-dataset gradient (scan path) must carry the loss in
    ITS dtype — a bf16 model whose loss computes in f32 exercised the old
    carry-dtype crash."""
    model_fn, params, data = _problem(jnp.bfloat16)

    def model_f32_loss(p, x):  # upcast logits: loss scalar becomes f32
        return model_fn(p, x).astype(jnp.float32)

    op = cl.GGNLinearOperator(
        model_f32_loss, cl.CrossEntropyLoss("mean"), params, data,
        check_deterministic=False,
    )
    grad, loss = op.gradient_and_loss()
    assert jnp.asarray(loss).dtype == jnp.float32
    for leaf in jax.tree.leaves(grad):
        assert leaf.dtype == jnp.bfloat16


def test_bf16_kfac_build_and_inverse():
    model_fn, params, data = _problem(jnp.bfloat16)
    kfac = cl.KFACLinearOperator(
        model_fn, cl.CrossEntropyLoss("mean"), params, data,
        fisher_type="mc", mc_samples=1, check_deterministic=False,
    )
    for leaf in jax.tree.leaves((kfac._aaT, kfac._ggT)):
        # covariance factors accumulate in f32 even for bf16 models (the
        # f32 loss-correction scalar promotes them) — bf16 accumulation of
        # sum-of-outer-products would be lossy; the kernel INPUTS stay bf16
        assert leaf.dtype == jnp.float32
    v = np.random.default_rng(0).standard_normal(kfac.shape[0]).astype(np.float32)
    assert np.isfinite(kfac @ v).all()
    inv = kfac.inverse(damping=1e-1)
    assert np.isfinite(inv @ v).all()


@pytest.mark.parametrize("recipe", ["kfac", "exact", "heuristic", "ekfac"])
def test_bf16_kfac_family_matvec_preserves_param_dtype(recipe):
    """KFAC-family matvecs must be dtype-stable: bf16 pytree in, bf16 out.

    Factors are STORED in f32 (the accumulation dtype) but the jitted chain
    apply computes in the operand dtype — an f32-promoted output broke
    ``lax.fori_loop`` embedding of the matvec (carry dtype mismatch) and
    silently ran the bf16 speed mode's matvecs as f32 MXU programs.
    """
    model_fn, params, data = _problem(jnp.bfloat16)
    kfac = cl.KFACLinearOperator(
        model_fn, cl.CrossEntropyLoss("mean"), params, data,
        fisher_type="mc", mc_samples=1, check_deterministic=False,
    )
    op = {
        "kfac": lambda: kfac,
        "exact": lambda: kfac.inverse(damping=1e-1, use_exact_damping=True),
        "heuristic": lambda: kfac.inverse(
            damping=1e-1, use_heuristic_damping=True
        ),
        "ekfac": lambda: cl.EKFACLinearOperator(
            model_fn, cl.CrossEntropyLoss("mean"), params, data,
            fisher_type="mc", mc_samples=1, check_deterministic=False,
        ),
    }[recipe]()
    M = jax.tree.map(lambda p: jnp.ones(p.shape + (1,), p.dtype), params)
    out = op @ M
    for leaf_in, leaf_out in zip(jax.tree.leaves(M), jax.tree.leaves(out)):
        assert leaf_out.dtype == leaf_in.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(leaf_out, np.float32)).all()
