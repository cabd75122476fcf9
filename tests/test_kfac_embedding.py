"""KFAC for embedding layers via exact diagonal input covariances.

The reference refuses embedding layers outright (``curvlinops/kfac.py:117``);
here the one-hot input structure makes the input covariance EXACTLY
``diag(token counts)``, so KFAC extends to embeddings at no approximation
cost and without materializing a ``[V, V]`` matrix. Oracle: the embedding
model must produce the SAME operator as the equivalent one-hot dense model
(which the reference's dense semantics cover).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import CrossEntropyLoss, FisherType, KFACType, MSELoss
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.utils import report_nonclose

V, C, D_OUT, B, T = 11, 6, 4, 8, 5


def _params(seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    return {
        "emb": 0.4 * jax.random.normal(k1, (V, C)),
        "head": {"W": 0.4 * jax.random.normal(k2, (C, D_OUT)),
                 "b": jnp.zeros(D_OUT)},
    }


def emb_model(p, tokens):
    h = p["emb"][tokens]  # [B, T, C]
    h = jnp.tanh(h)
    return (h @ p["head"]["W"] + p["head"]["b"]).reshape(
        tokens.shape[0] * tokens.shape[1], D_OUT
    )


def onehot_model(p, x_onehot):
    h = x_onehot @ p["emb"]  # [B, T, C] via dense matmul on one-hots
    h = jnp.tanh(h)
    return (h @ p["head"]["W"] + p["head"]["b"]).reshape(
        x_onehot.shape[0] * x_onehot.shape[1], D_OUT
    )


def _data(seed=1):
    kt, ky = jax.random.split(jax.random.key(seed))
    tokens = jax.random.randint(kt, (B, T), 0, V)
    y = jax.random.randint(ky, (B * T,), 0, D_OUT)
    return tokens, y


@pytest.mark.parametrize("fisher_type", [FisherType.TYPE2, FisherType.EMPIRICAL])
def test_embedding_kfac_equals_onehot_dense(fisher_type):
    """Embedding KFAC == dense KFAC on the explicit one-hot model."""
    params = _params()
    tokens, y = _data()
    loss = CrossEntropyLoss("mean")
    k_emb = KFACLinearOperator(
        emb_model, loss, params, [(tokens, y)], fisher_type=fisher_type
    )
    k_hot = KFACLinearOperator(
        onehot_model, loss, params,
        [(jax.nn.one_hot(tokens, V), y)], fisher_type=fisher_type,
    )
    emb_groups = [g for g in k_emb.groups if g.input_diag]
    assert len(emb_groups) == 1 and emb_groups[0].d_in == V

    vt = jax.tree.map(
        lambda leaf: jax.random.normal(jax.random.key(5), leaf.shape), params
    )
    r_e, r_h = k_emb @ vt, k_hot @ vt
    report_nonclose(r_e["emb"], r_h["emb"], 5e-4, 1e-5, name="emb block")
    report_nonclose(
        r_e["head"]["W"], r_h["head"]["W"], 5e-4, 1e-5, name="head block"
    )
    np.testing.assert_allclose(k_emb.trace(), k_hot.trace(), rtol=1e-4)
    np.testing.assert_allclose(
        k_emb.frobenius_norm(), k_hot.frobenius_norm(), rtol=1e-4
    )


@pytest.mark.parametrize(
    "inv_kwargs",
    [
        {"damping": 0.1},
        {"damping": 0.1, "use_heuristic_damping": True},
        {"damping": 0.1, "use_exact_damping": True},
    ],
    ids=["plain", "heuristic", "exact"],
)
def test_embedding_kfac_inverse_equals_onehot_dense(inv_kwargs):
    """All damping modes of the embedding-block inverse match the dense path.

    Note plain/heuristic damping are only comparable because every token
    appears in the batch (damped Cholesky of a singular one-hot covariance
    differs from damping its diagonal otherwise); exact damping always is.
    """
    params = _params()
    # data covering every token so the count diagonal is non-singular
    tokens = jnp.arange(V * 2).reshape(2, V) % V
    y = jax.random.randint(jax.random.key(2), (2 * V,), 0, D_OUT)
    loss = CrossEntropyLoss("mean")
    k_emb = KFACLinearOperator(
        emb_model, loss, params, [(tokens, y)], fisher_type=FisherType.TYPE2
    )
    k_hot = KFACLinearOperator(
        onehot_model, loss, params,
        [(jax.nn.one_hot(tokens, V), y)], fisher_type=FisherType.TYPE2,
    )
    vt = jax.tree.map(
        lambda leaf: jax.random.normal(jax.random.key(5), leaf.shape), params
    )
    r_e = k_emb.inverse(**inv_kwargs) @ vt
    r_h = k_hot.inverse(**inv_kwargs) @ vt
    report_nonclose(r_e["emb"], r_h["emb"], 1e-3, 1e-4, name="emb inverse")


def test_embedding_counts_diagonal():
    """The stored input factor is exactly the normalized token counts."""
    params = _params()
    tokens, y = _data()
    k = KFACLinearOperator(
        emb_model, MSELoss("mean"), params,
        [(tokens, jax.random.normal(jax.random.key(3), (B * T, D_OUT)))],
        fisher_type=FisherType.TYPE2,
    )
    gi = next(i for i, g in enumerate(k.groups) if g.input_diag)
    counts = np.zeros(V)
    for t in np.asarray(tokens).reshape(-1):
        counts[t] += 1
    np.testing.assert_allclose(
        np.asarray(k._aaT[gi]), counts / (B * T), rtol=1e-6
    )


def test_embedding_state_dict_roundtrip():
    params = _params()
    tokens, y = _data()
    k = KFACLinearOperator(
        emb_model, CrossEntropyLoss("mean"), params, [(tokens, y)],
        fisher_type=FisherType.TYPE2,
    )
    vt = jax.tree.map(
        lambda leaf: jax.random.normal(jax.random.key(5), leaf.shape), params
    )
    before = k @ vt
    k.load_state_dict(jax.tree.map(np.asarray, k.state_dict()))
    after = k @ vt
    report_nonclose(before["emb"], after["emb"], 1e-6, 1e-7, name="roundtrip")


def test_gpt_kfac_with_embeddings():
    """include_embeddings=True covers wte/wpe as diagonal-input KFAC groups."""
    from functools import partial

    from curvlinops_tpu.models.gpt import TINY_GPT, gpt_apply, init_gpt
    from curvlinops_tpu.models.resnet import kfac_restricted

    config = TINY_GPT
    params = init_gpt(jax.random.key(0), config)
    apply_fn = partial(gpt_apply, config=config)
    tokens = jax.random.randint(jax.random.key(1), (2, config.block_size), 0,
                                config.vocab_size)
    y = jax.random.randint(
        jax.random.key(2), (2 * config.block_size,), 0, config.vocab_size
    )
    fn, p = kfac_restricted(apply_fn, params, include_embeddings=True)
    k = KFACLinearOperator(
        fn, CrossEntropyLoss("mean"), p, [(tokens, y)],
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    emb_groups = [g for g in k.groups if g.input_diag]
    assert len(emb_groups) == 2  # wte + wpe
    vt = jax.tree.map(lambda leaf: 0.01 * jnp.ones(leaf.shape), p)
    r = k @ vt
    assert all(
        bool(jnp.isfinite(leaf).all()) for leaf in jax.tree.leaves(r)
    )
    ri = k.inverse(damping=0.1, use_exact_damping=True) @ vt
    assert all(
        bool(jnp.isfinite(leaf).all()) for leaf in jax.tree.leaves(ri)
    )


def test_embedding_eigenvalue_correction_matches_dense():
    """Segment-sum correction == dense correction with identity Q_a."""
    from curvlinops_tpu.kfac import math as kmath

    Vv, Bn, S, D1, vocab = 2, 4, 3, 5, 7
    kg, ki, kq = jax.random.split(jax.random.key(0), 3)
    g = jax.random.normal(kg, (Vv, Bn, S, D1))
    idx = jax.random.randint(ki, (Bn, S, 1), 0, vocab)
    Q = jnp.linalg.qr(jax.random.normal(kq, (D1, D1)))[0]

    fast = kmath.eigenvalue_correction_embedding(g, Q, idx, vocab)
    a = jax.nn.one_hot(idx[..., 0], vocab)  # [B, S, vocab]
    dense = kmath.eigenvalue_correction(
        g, Q, a, jnp.eye(vocab), "per_example_gradients"
    )
    report_nonclose(fast, dense, 1e-5, 1e-6, name="embedding correction")


def test_embedding_ekfac_closer_than_kfac():
    """George et al. 2018: EKFAC is Frobenius-closer to the exact GGN block
    than KFAC in the same eigenbasis — holds for the embedding block too.

    Uses single-position sequences: with weight sharing the corrected
    eigenvalues are per-EXAMPLE (positions summed inside each sample,
    reference ``layer_io.py:301-336``), whose cross terms break the per-row
    optimality bound against the GGN target (same as the reference).
    """
    from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator

    from tests.utils import dense_ggn

    params = _params()
    kt, ky = jax.random.split(jax.random.key(1))
    tokens = jax.random.randint(kt, (16, 1), 0, V)  # T=1: no sharing
    y = jax.random.randint(ky, (16,), 0, D_OUT)
    loss = CrossEntropyLoss("mean")
    data = [(tokens, y)]
    kw = dict(fisher_type=FisherType.TYPE2)
    kfac = KFACLinearOperator(emb_model, loss, params, data, **kw)
    ekfac = EKFACLinearOperator(emb_model, loss, params, data, **kw)
    dense = np.asarray(dense_ggn(emb_model, loss, params, data))

    k_dense = np.asarray(kfac.todense())
    e_dense = np.asarray(ekfac.todense())
    # compare on the block-diagonal projection (KFAC's target)
    from tests.test_kfac import _leaf_ranges, blockdiag_projection

    proj = blockdiag_projection(dense, params, kfac.groups)
    gap_k = np.linalg.norm(k_dense - proj)
    gap_e = np.linalg.norm(e_dense - proj)
    assert gap_e <= gap_k + 1e-6, (gap_e, gap_k)

    # inverse consistency in the eigenbasis
    vt = jax.tree.map(
        lambda leaf: jax.random.normal(jax.random.key(5), leaf.shape), params
    )
    r = ekfac.inverse(0.1) @ (ekfac @ vt)
    # (E + 0.1)^-1 E v ~ v only for small damping; just check finiteness+shape
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(r))


def test_tied_embedding_ekfac_equals_onehot_dense():
    """One table, TWO lookups: the EKFAC correction must concatenate each
    use's token indices along the sharing axis exactly as the gradients are
    concatenated. Oracle: the tied-dense one-hot model."""
    from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator

    params = _params()

    def tied_emb_model(p, tokens):
        h = p["emb"][tokens] + 0.5 * p["emb"][jnp.roll(tokens, 1, axis=1)]
        h = jnp.tanh(h)
        return (h @ p["head"]["W"] + p["head"]["b"]).reshape(
            tokens.shape[0] * tokens.shape[1], D_OUT
        )

    def tied_onehot_model(p, x_onehot):
        rolled = jnp.roll(x_onehot, 1, axis=1)
        h = x_onehot @ p["emb"] + 0.5 * (rolled @ p["emb"])
        h = jnp.tanh(h)
        return (h @ p["head"]["W"] + p["head"]["b"]).reshape(
            x_onehot.shape[0] * x_onehot.shape[1], D_OUT
        )

    tokens, y = _data()
    onehot = jax.nn.one_hot(tokens, V)
    loss = CrossEntropyLoss("mean")
    kw = dict(fisher_type=FisherType.TYPE2, check_deterministic=False)
    e_emb = EKFACLinearOperator(
        tied_emb_model, loss, params, [(tokens, y)], **kw
    )
    e_dense = EKFACLinearOperator(
        tied_onehot_model, loss, params, [(onehot, y)], **kw
    )
    report_nonclose(
        np.asarray(e_emb.todense()),
        np.asarray(e_dense.todense()),
        rtol=1e-4,
        atol=1e-6,
        name="tied embedding EKFAC vs one-hot dense",
    )


def test_embedding_refusals():
    """REDUCE, EKFAC, KFOC, embedding+head tying, and biased lookups refuse."""
    from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator
    from curvlinops_tpu.kfac.kfoc import KFOCLinearOperator

    params = _params()
    tokens, y = _data()
    loss = CrossEntropyLoss("mean")

    with pytest.raises(ValueError, match="EXPAND"):
        KFACLinearOperator(
            emb_model, loss, params, [(tokens, y)],
            fisher_type=FisherType.TYPE2, kfac_approx=KFACType.REDUCE,
        )

    # embedding lookups inside a scan: EKFAC refuses (KFAC supports shared)
    def scan_emb_model(p, tokens):
        def body(h, _):
            return h + jnp.tanh(p["emb"][tokens]).mean(1), None

        h0 = jnp.zeros((tokens.shape[0], C))
        h, _ = jax.lax.scan(body, h0, None, length=2)
        return h

    y_c = jax.random.randint(jax.random.key(7), (B,), 0, C)
    with pytest.raises(ValueError, match="scan"):
        EKFACLinearOperator(
            scan_emb_model, loss, {"emb": params["emb"]}, [(tokens, y_c)],
            fisher_type=FisherType.TYPE2,
        )
    with pytest.raises(ValueError, match="embedding"):
        KFOCLinearOperator(
            emb_model, loss, params, [(tokens, y)], fisher_type=FisherType.TYPE2
        )

    # weight tying across kinds: embedding table reused as the output head
    def tied_model(p, tokens):
        h = jnp.tanh(p["emb"][tokens])
        return (h @ p["emb"].T).reshape(tokens.shape[0] * tokens.shape[1], V)

    y_tied = jax.random.randint(jax.random.key(4), (B * T,), 0, V)
    with pytest.raises(ValueError, match="tied across layer kinds"):
        KFACLinearOperator(
            tied_model, loss, {"emb": params["emb"]}, [(tokens, y_tied)],
            fisher_type=FisherType.TYPE2,
        )

    # bias added to a lookup
    def biased_model(p, tokens):
        h = p["emb"][tokens] + p["b"]
        return h.reshape(tokens.shape[0] * tokens.shape[1], C)

    y_b = jax.random.randint(jax.random.key(6), (B * T,), 0, C)
    with pytest.raises(ValueError, match="bias"):
        KFACLinearOperator(
            biased_model, loss,
            {"emb": params["emb"], "b": jnp.zeros(C)},
            [(tokens, y_b)], fisher_type=FisherType.TYPE2,
        )
