"""Tests for the traced-matmat protocol and the fused solver programs.

The `traced()` contract (`ops/base.py`) hoists every closed-over array out of
a trace of `_matmat` so iterative solvers can fuse whole loops into single
jitted programs with operator state as jit ARGUMENTS (no embedded HLO
constants — the remote-compile-service constraint documented in
`utils/misc.py::FrozenModelFn`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import curvlinops_tpu as cl
from curvlinops_tpu.losses import CrossEntropyLoss, MSELoss


def _mlp_problem(n_batches=3, batch=8, ragged=False):
    def model_fn(params, X):
        return jax.nn.relu(X @ params["w1"] + params["b1"]) @ params["w2"]

    k = jax.random.split(jax.random.key(0), 2 + 2 * n_batches)
    params = {
        "w1": jax.random.normal(k[0], (6, 10)) * 0.4,
        "b1": jnp.zeros(10),
        "w2": jax.random.normal(k[1], (10, 3)) * 0.4,
    }
    data = []
    for i in range(n_batches):
        b = batch + (i if ragged else 0)
        data.append(
            (
                jax.random.normal(k[2 + 2 * i], (b, 6)),
                jax.random.randint(k[3 + 2 * i], (b,), 0, 3),
            )
        )
    return model_fn, params, data


def test_traced_hoists_constants_and_matches():
    """fn(M, *consts) must equal _matmat(M), with data/params in consts."""
    model_fn, params, data = _mlp_problem()
    G = cl.GGNLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    fn, consts = G.traced(ncols=2)
    # params (3 leaves) and the data batches must be among the hoisted consts
    n_payload = sum(np.size(c) if not hasattr(c, "size") else c.size
                    for c in consts)
    assert n_payload >= sum(p.size for p in jax.tree.leaves(params))

    M = jax.tree.map(
        lambda p: jax.random.normal(jax.random.key(5), p.shape + (2,)), params
    )
    ref = G._matmat(M)
    out = jax.jit(fn)(M, *consts)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # the jitted program must not embed any large dense constants
    txt = jax.jit(fn).lower(M, *consts).as_text()
    assert "constant(" not in txt


def test_traced_flat_roundtrip():
    model_fn, params, data = _mlp_problem(n_batches=1)
    H = cl.HessianLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    fn, consts = H.traced_flat(ncols=3)
    X = np.random.default_rng(0).normal(size=(H.shape[1], 3)).astype(np.float32)
    ref = H @ X
    out = jax.jit(fn)(jnp.asarray(X), *consts)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("ragged", [False, True], ids=["uniform", "ragged"])
def test_fused_batch_accumulation_matches_streaming(ragged):
    """The scan/unrolled fused dataset accumulation equals the streaming loop."""
    model_fn, params, data = _mlp_problem(n_batches=4, ragged=ragged)
    G1 = cl.GGNLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    G2 = cl.GGNLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    G2.fuse_batches = False
    mode = G1._batch_fn_cache.get("fused_state")
    v = np.random.default_rng(1).normal(size=G1.shape[1]).astype(np.float32)
    out_fused = G1 @ v
    assert G1._batch_fn_cache["fused_state"] is not None
    assert G1._batch_fn_cache["fused_state"][0] == ("unroll" if ragged else "scan")
    out_stream = G2 @ v
    assert G2._batch_fn_cache.get("fused_state") is None  # opted out
    np.testing.assert_allclose(out_fused, out_stream, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ragged", [False, True], ids=["uniform", "ragged"])
def test_fuse_policy_past_unroll_limit(ragged, monkeypatch):
    """Past the unroll limit, uniform datasets still fuse via scan (O(1)
    trace), while ragged ones stream (unrolling would blow up the trace)."""
    model_fn, params, data = _mlp_problem(n_batches=4, ragged=ragged)
    G = cl.GGNLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    monkeypatch.setattr(type(G), "_FUSE_UNROLL_LIMIT", 2)
    v = np.random.default_rng(3).normal(size=G.shape[1]).astype(np.float32)
    out = G @ v
    state = G._batch_fn_cache.get("fused_state")
    if ragged:
        assert state is None  # streams batch-by-batch
    else:
        assert state is not None and state[0] == "scan"
    G2 = cl.GGNLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    G2.fuse_batches = False
    np.testing.assert_allclose(out, G2 @ v, rtol=1e-5, atol=1e-6)


def test_fused_neumann_matches_dense_inverse_with_preconditioner():
    M = jax.random.normal(jax.random.key(0), (8, 8)) / 8
    A = cl.MatrixLinearOperator(M @ M.T + jnp.eye(8))
    P = cl.MatrixLinearOperator(jnp.diag(1.0 / jnp.diag(M @ M.T + jnp.eye(8))))
    v = np.random.default_rng(2).normal(size=8).astype(np.float32)
    x = cl.NeumannInverseLinearOperator(
        A, num_terms=400, scale=0.4, preconditioner=P
    ) @ v
    x_true = np.linalg.solve(np.asarray(A.todense()), v)
    np.testing.assert_allclose(x, x_true, atol=1e-3)


def test_fused_neumann_divergence_raises_with_term_index():
    A = cl.MatrixLinearOperator(10.0 * jnp.eye(4))
    op = cl.NeumannInverseLinearOperator(A, num_terms=300, scale=1.0)
    with pytest.raises(ValueError, match="diverged"):
        op @ np.ones(4, dtype=np.float32)


def test_cg_program_cache_reused_across_calls():
    model_fn, params, data = _mlp_problem(n_batches=2)
    G = cl.GGNLinearOperator(
        model_fn, MSELoss("mean"), params,
        [(X, jax.nn.one_hot(y, 3)) for X, y in data],
        check_deterministic=False,
    )
    damped = G + 1e-2 * cl.IdentityLinearOperator(G.in_spec)
    cg = cl.CGInverseLinearOperator(damped, maxiter=200, tol=1e-8)
    v = np.random.default_rng(3).normal(size=G.shape[1]).astype(np.float32)
    x1 = cg @ v
    assert len(cg._program_cache[1]) == 1
    x2 = cg @ (2 * v)
    assert len(cg._program_cache[1]) == 1  # same-width solve reuses the program
    np.testing.assert_allclose(2 * x1, x2, rtol=1e-4, atol=1e-5)
    # the solve actually inverts
    np.testing.assert_allclose(damped @ x1, v, atol=1e-3)


def test_topk_eigenpairs_fused_matches_eager():
    mat = jax.random.normal(jax.random.key(1), (40, 40))
    A = cl.MatrixLinearOperator(mat @ mat.T + jnp.eye(40))
    w_f, V_f = cl.topk_eigenpairs(A, k=3, maxiter=100, key=jax.random.key(2))
    w_e, V_e = cl.topk_eigenpairs(
        A, k=3, maxiter=100, key=jax.random.key(2), jit=False
    )
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_e), rtol=1e-4)
    w_true = np.linalg.eigvalsh(np.asarray(mat @ mat.T + jnp.eye(40)))[::-1][:3]
    np.testing.assert_allclose(np.asarray(w_f), w_true, rtol=1e-3)


def test_fast_lanczos_program_cached_on_operator():
    from curvlinops_tpu.solvers.lanczos import fast_lanczos

    mat = jax.random.normal(jax.random.key(3), (30, 30))
    A = cl.MatrixLinearOperator(mat @ mat.T)
    evals, _ = fast_lanczos(A, ncv=10, key=jax.random.key(0))
    assert any(k[:2] == ("fast_lanczos", 10) for k in A._program_cache[1])
    # extremal Ritz value approximates the top eigenvalue
    top = float(np.linalg.eigvalsh(np.asarray(mat @ mat.T))[-1])
    assert abs(float(evals[-1]) - top) / top < 0.05


def test_traced_invalidation_on_mutation():
    """In-place mutations (chain __setitem__) must invalidate cached traces
    everywhere, including composites that embed the mutated child."""
    A = cl.MatrixLinearOperator(2.0 * jnp.eye(4))
    B = cl.MatrixLinearOperator(3.0 * jnp.eye(4))
    chain = A @ B
    summed = chain + cl.IdentityLinearOperator(chain.in_spec)
    fn, consts = summed.traced(1)
    v = jnp.ones((4, 1))
    np.testing.assert_allclose(np.asarray(fn(v, *consts)), 7.0 * np.ones((4, 1)))
    chain[1] = cl.MatrixLinearOperator(5.0 * jnp.eye(4))  # bumps the epoch
    fn2, consts2 = summed.traced(1)
    np.testing.assert_allclose(
        np.asarray(fn2(v, *consts2)), 11.0 * np.ones((4, 1))
    )


@pytest.mark.parametrize("ragged", [False, True], ids=["uniform", "ragged"])
def test_fused_gradient_and_loss_matches_streaming(ragged):
    model_fn, params, data = _mlp_problem(n_batches=4, ragged=ragged)
    G1 = cl.GGNLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    G2 = cl.GGNLinearOperator(
        model_fn, CrossEntropyLoss("mean"), params, data, check_deterministic=False
    )
    G2.fuse_batches = False
    g1, l1 = G1.gradient_and_loss()
    g2, l2 = G2.gradient_and_loss()
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_cg_with_kfac_preconditioner_fused():
    """Natural-gradient style: CG on the damped GGN preconditioned by the
    KFAC inverse — the whole solve (operator + Kronecker-chain
    preconditioner) fuses into one program via traced()."""
    from curvlinops_tpu.kfac.operator import KFACLinearOperator

    model_fn, params, data = _mlp_problem(n_batches=2)
    loss = CrossEntropyLoss("mean")
    G = cl.GGNLinearOperator(model_fn, loss, params, data,
                             check_deterministic=False)
    damped = G + 1e-2 * cl.IdentityLinearOperator(G.in_spec)
    kfac = KFACLinearOperator(model_fn, loss, params, data,
                              check_deterministic=False)
    precond = kfac.inverse(damping=1e-2)

    cg = cl.CGInverseLinearOperator(damped, maxiter=200, tol=1e-8,
                                    preconditioner=precond)
    v = np.random.default_rng(4).normal(size=G.shape[1]).astype(np.float32)
    x = cg @ v
    Gd = np.asarray(damped @ np.eye(damped.shape[0], dtype=np.float32))
    np.testing.assert_allclose(Gd @ x, v, atol=1e-3)
    assert int(cg.last_info["iterations"]) < 200  # converged before the cap
