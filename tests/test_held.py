"""Held-linearization operators equal their base operators exactly.

``op.linearized()`` caches per-batch model linearization residuals on device
(``curvature/held.py``); the matrix must be IDENTICAL (same kernel structure,
same MC samples) to the base operator's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import (
    EFLinearOperator,
    GGNLinearOperator,
    HessianLinearOperator,
    KFACLinearOperator,
    MSELoss,
)
from curvlinops_tpu.losses import CrossEntropyLoss

from tests.utils import report_nonclose


def _mlp_case(seed=0, ce=False, relu=False):
    k = jax.random.key(seed)
    params = {
        "l1": {"W": 0.4 * jax.random.normal(jax.random.fold_in(k, 1), (6, 8)),
               "b": jnp.zeros(8)},
        "l2": {"W": 0.4 * jax.random.normal(jax.random.fold_in(k, 2), (8, 4)),
               "b": jnp.zeros(4)},
    }
    act = jax.nn.relu if relu else jnp.tanh

    def model(p, x):
        h = act(x @ p["l1"]["W"] + p["l1"]["b"])
        return h @ p["l2"]["W"] + p["l2"]["b"]

    def batch(i, n):
        kx, ky = jax.random.split(jax.random.fold_in(k, 100 + i))
        X = jax.random.normal(kx, (n, 6))
        y = (jax.random.randint(ky, (n,), 0, 4) if ce
             else jax.random.normal(ky, (n, 4)))
        return X, y

    return model, params, [batch(0, 5), batch(1, 3)]


@pytest.mark.parametrize("reduction", ["mean", "sum"])
@pytest.mark.parametrize(
    "op_cls", [HessianLinearOperator, GGNLinearOperator, EFLinearOperator]
)
def test_held_equals_base(op_cls, reduction):
    model, params, data = _mlp_case()
    op = op_cls(model, MSELoss(reduction), params, data,
                check_deterministic=False)
    held = op.linearized()
    report_nonclose(held.todense(), op.todense(), rtol=1e-6, atol=1e-7,
                    name=f"held {op_cls.__name__}")


@pytest.mark.parametrize(
    "op_cls", [HessianLinearOperator, GGNLinearOperator, EFLinearOperator]
)
def test_held_relu_boolean_residuals(op_cls):
    """ReLU linearizations carry BOOLEAN mask residuals; the make_jaxpr
    hoisting in ``held._split_linearize`` must hoist those too (the former
    ``jax.closure_convert`` path hoisted only inexact dtypes and leaked the
    masks as escaped tracers under jit)."""
    model, params, data = _mlp_case(seed=5, relu=True)
    op = op_cls(model, MSELoss("mean"), params, data,
                check_deterministic=False)
    held = op.linearized()
    report_nonclose(held.todense(), op.todense(), rtol=1e-6, atol=1e-7,
                    name=f"held ReLU {op_cls.__name__}")


def test_held_mc_fisher_same_samples():
    """Same folded keys -> the held MC Fisher reuses the base's samples
    (tight tolerance: only XLA op-ordering may differ, never the samples)."""
    model, params, data = _mlp_case(seed=1)
    op = GGNLinearOperator(model, MSELoss("mean"), params, data,
                           mc_samples=3, seed=7, check_deterministic=False)
    held = op.linearized()
    report_nonclose(held.todense(), op.todense(), rtol=1e-5, atol=1e-7,
                    name="held MC Fisher")


def test_held_cross_entropy_and_algebra():
    model, params, data = _mlp_case(seed=2, ce=True)
    op = GGNLinearOperator(model, CrossEntropyLoss("mean"), params, data,
                           check_deterministic=False)
    held = op.linearized()
    report_nonclose(held.todense(), op.todense(), rtol=1e-6, atol=1e-7,
                    name="held CE GGN")
    # held operators compose with the operator algebra + flat/np edges
    v = np.random.default_rng(0).normal(size=held.shape[1]).astype(np.float32)
    combo = 2.0 * held + op
    report_nonclose(combo @ v, 3.0 * (op @ v), rtol=1e-5, atol=1e-6,
                    name="held algebra")


def test_held_jacobian_pair():
    """Held J / J^T equal the base operators and stay mutual adjoints
    (ragged batches exercise the concat-rows / slice-rows combines)."""
    from curvlinops_tpu.curvature.jacobian import JacobianLinearOperator

    model, params, data = _mlp_case(seed=6, relu=True)
    J = JacobianLinearOperator(model, params, data, check_deterministic=False)
    heldJ = J.linearized()
    report_nonclose(heldJ.todense(), J.todense(), rtol=1e-6, atol=1e-7,
                    name="held Jacobian")
    JT = J.adjoint()
    heldJT = heldJ.adjoint()
    report_nonclose(heldJT.todense(), JT.todense(), rtol=1e-6, atol=1e-7,
                    name="held Jacobian^T")
    report_nonclose(heldJT.todense(), heldJ.todense().T, rtol=1e-6, atol=1e-7,
                    name="held adjoint consistency")


def test_held_composes_with_solver_layer():
    """Held operators drop into the iterative/estimation layer unchanged:
    CG inverse solves against them, hutchinson uses their matmats, and
    ``traced()`` hoists their held state into jit arguments."""
    from curvlinops_tpu.estimators.trace import hutchinson_trace
    from curvlinops_tpu.ops.dense import IdentityLinearOperator
    from curvlinops_tpu.ops.inverse import CGInverseLinearOperator

    model, params, data = _mlp_case(seed=7, relu=True)
    op = GGNLinearOperator(model, MSELoss("mean"), params, data,
                           check_deterministic=False)
    held = op.linearized()
    I = IdentityLinearOperator(op.in_spec)
    v = np.random.default_rng(1).normal(size=op.shape[1]).astype(np.float32)
    inv_b = CGInverseLinearOperator(op + 0.1 * I, maxiter=400, tol=1e-7)
    inv_h = CGInverseLinearOperator(held + 0.1 * I, maxiter=400, tol=1e-7)
    report_nonclose(inv_h @ v, inv_b @ v, rtol=1e-5, atol=1e-6,
                    name="CG inverse on held")
    k = jax.random.key(11)  # same probes -> identical estimates
    np.testing.assert_allclose(
        float(hutchinson_trace(held, num_matvecs=32, key=k)),
        float(hutchinson_trace(op, num_matvecs=32, key=k)),
        rtol=1e-5,
    )
    fn, consts = held.traced(1)
    M = jax.tree.map(lambda p: 0.01 * jnp.ones(p.shape + (1,), p.dtype),
                     params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        jax.jit(fn)(M, *consts),
        held._matmat(M),
    )


def test_held_kfac_refused():
    model, params, data = _mlp_case(seed=3)
    kfac = KFACLinearOperator(model, MSELoss("mean"), params, data,
                              check_deterministic=False)
    with pytest.raises((NotImplementedError, AttributeError)):
        kfac.linearized()


def test_held_mesh_matches_single_device():
    from curvlinops_tpu.parallel.mesh import make_mesh

    model, params, data = _mlp_case(seed=4)
    # uniform batch sizes so each shards over 8 devices
    data = [(jnp.concatenate([data[0][0], data[1][0]])[:8],
             jnp.concatenate([data[0][1], data[1][1]])[:8])]
    mesh = make_mesh(8)
    op = GGNLinearOperator(model, MSELoss("mean"), params, data,
                           check_deterministic=False)
    held_mesh = GGNLinearOperator(model, MSELoss("mean"), params, data,
                                  check_deterministic=False,
                                  mesh=mesh).linearized()
    report_nonclose(held_mesh.todense(), op.todense(), rtol=1e-5, atol=1e-6,
                    name="held mesh GGN")


@pytest.mark.parametrize(
    "op_cls", [HessianLinearOperator, GGNLinearOperator, EFLinearOperator]
)
def test_held_remat_equals_held(op_cls):
    """``linearized(remat=...)`` computes the identical matrix while holding
    strictly fewer residual bytes (the rest is recomputed per matvec)."""
    from curvlinops_tpu.curvature.held import save_smaller_than

    model, params, data = _mlp_case(seed=3, relu=True)
    base = op_cls(model, MSELoss("mean"), params, data)
    full = base.linearized()
    everything = base.linearized(remat=True)
    policy = base.linearized(remat=save_smaller_than(8 * 5 * 4))

    def held_bytes(op):
        total = 0
        for _, state, _ in op._held:
            for leaf in jax.tree.leaves(state):
                total += leaf.size * leaf.dtype.itemsize
        return total

    v = np.random.default_rng(0).standard_normal(base.shape[1]).astype(np.float32)
    ref = full @ v
    report_nonclose(everything @ v, ref, rtol=1e-6, atol=1e-7, name="remat=True")
    report_nonclose(policy @ v, ref, rtol=1e-6, atol=1e-7, name="remat=policy")
    assert held_bytes(everything) < held_bytes(full)
    # (no byte assertion for the policy form at toy sizes: checkpoint also
    # holds the region inputs, which can exceed the dropped residuals here;
    # the attention-scale test below asserts the real saving)


def test_held_remat_attention_scale_policy():
    """``save_smaller_than`` drops the [B, H, T, T] attention product from the
    held residuals of a toy attention model but keeps the projections."""
    from curvlinops_tpu.curvature.held import save_smaller_than

    k = jax.random.key(5)
    B, T, D = 2, 16, 4
    params = {
        "q": 0.3 * jax.random.normal(jax.random.fold_in(k, 1), (D, D)),
        "k": 0.3 * jax.random.normal(jax.random.fold_in(k, 2), (D, D)),
        "v": 0.3 * jax.random.normal(jax.random.fold_in(k, 3), (D, D)),
    }

    def model(p, x):  # x: [B, T, D]
        q, kk, v = x @ p["q"], x @ p["k"], x @ p["v"]
        a = jax.nn.softmax(q @ kk.transpose(0, 2, 1) / np.sqrt(D), axis=-1)
        return (a @ v).reshape(x.shape[0], -1)

    X = jax.random.normal(jax.random.fold_in(k, 4), (B, T, D))
    y = jax.random.normal(jax.random.fold_in(k, 5), (B, T * D))
    base = GGNLinearOperator(model, MSELoss("mean"), params, [(X, y)])
    full = base.linearized()
    # threshold between the projections (B*T*D floats) and the attention
    # product (B*T*T floats)
    lim = GGNLinearOperator(
        model, MSELoss("mean"), params, [(X, y)],
    ).linearized(remat=save_smaller_than(B * T * D * 4 + 1))

    def held_bytes(op):
        return sum(
            leaf.size * leaf.dtype.itemsize
            for _, state, _ in op._held
            for leaf in jax.tree.leaves(state)
        )

    # the [B, T, T] tensors (attention rows + softmax residuals) are gone
    assert held_bytes(lim) < held_bytes(full) - B * T * T * 4
    v = np.random.default_rng(1).standard_normal(base.shape[1]).astype(np.float32)
    report_nonclose(lim @ v, full @ v, rtol=1e-5, atol=1e-6, name="attn remat")
