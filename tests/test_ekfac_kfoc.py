"""EKFAC and KFOC tests: exactness, optimality, strategy agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import FisherType
from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator
from curvlinops_tpu.kfac.kfoc import KFOCLinearOperator
from curvlinops_tpu.kfac.operator import KFACLinearOperator

from tests.cases import make_case
from tests.test_kfac import _make_linear_case, blockdiag_projection
from tests.utils import dense_ggn, report_nonclose


def test_ekfac_exact_one_datum():
    """One datum + TYPE2: EKFAC == KFAC == block-diagonal GGN."""
    case = make_case("mlp_ce_mean")
    X, y = case["data"][0]
    data = [(X[:1], y[:1])]
    ekfac = EKFACLinearOperator(
        case["model_fn"],
        case["loss_fn"],
        case["params"],
        data,
        fisher_type=FisherType.TYPE2,
    )
    dense = dense_ggn(case["model_fn"], case["loss_fn"], case["params"], data)
    expected = blockdiag_projection(dense, case["params"], ekfac.groups)
    report_nonclose(ekfac.todense(), expected, rtol=1e-3, atol=1e-5, name="ekfac")


def test_ekfac_closer_than_kfac():
    """EKFAC is at least as close to the GGN block-diagonal in Frobenius norm."""
    case = make_case("mlp_ce_mean")
    kw = dict(fisher_type=FisherType.TYPE2, check_deterministic=False)
    kfac = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"], **kw
    )
    ekfac = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"], **kw
    )
    dense = dense_ggn(case["model_fn"], case["loss_fn"], case["params"], case["data"])
    target = blockdiag_projection(dense, case["params"], kfac.groups)
    err_kfac = np.linalg.norm(np.asarray(kfac.todense()) - target)
    err_ekfac = np.linalg.norm(np.asarray(ekfac.todense()) - target)
    assert err_ekfac <= err_kfac * (1 + 1e-5), (err_ekfac, err_kfac)


def test_ekfac_strategies_agree():
    """Gramian and per-example-gradient eigencorrections coincide."""
    case = _make_linear_case("mean")
    kw = dict(fisher_type=FisherType.TYPE2, check_deterministic=False)
    lam_a = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        force_strategy="gramian", **kw,
    ).corrected_eigenvalues
    lam_b = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        force_strategy="per_example_gradients", **kw,
    ).corrected_eigenvalues
    for gi in lam_a:
        report_nonclose(lam_a[gi], lam_b[gi], rtol=1e-4, atol=1e-6,
                        name=f"strategy {gi}")


def test_ekfac_rejects_3d_output():
    case = make_case("seq_ce_mean")
    with pytest.raises(ValueError, match="2d"):
        EKFACLinearOperator(
            case["model_fn"], case["loss_fn"], case["params"], case["data"],
            check_deterministic=False,
        )


def test_ekfac_inverse():
    case = _make_linear_case("mean")
    ekfac = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    dense = np.asarray(ekfac.todense())
    delta = 0.3
    inv = ekfac.inverse(damping=delta)
    v = np.random.default_rng(0).standard_normal(ekfac.shape[0]).astype(np.float32)
    expected = np.linalg.solve(dense + delta * np.eye(len(dense)), v)
    report_nonclose(inv @ v, expected, rtol=5e-3, atol=1e-4, name="ekfac inverse")


def _dense_vanloan_top_pair(G, d1, d2):
    R = G.reshape(d1, d2, d1, d2).transpose(0, 2, 1, 3).reshape(d1 * d1, d2 * d2)
    u, s, vt = np.linalg.svd(R, full_matrices=False)
    S1 = np.sqrt(s[0]) * u[:, 0].reshape(d1, d1)
    S2 = np.sqrt(s[0]) * vt[0].reshape(d2, d2)
    return S1, S2


def test_kfoc_factors_match_dense_vanloan_svd():
    """KFOC factors reproduce the dense Van Loan top singular pair."""
    case = make_case("mlp_ce_mean")
    X, y = case["data"][0]
    data = [(X, y)]
    kfoc = KFOCLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], data,
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    dense = dense_ggn(case["model_fn"], case["loss_fn"], case["params"], data)

    from tests.test_kfac import _leaf_ranges

    ranges = _leaf_ranges(case["params"])
    for gi, group in enumerate(kfoc.groups):
        if group.weight_path is None:
            # bias block stores the exact GGN block
            lo, hi = ranges[tuple(group.bias_path)]
            block = dense[lo:hi, lo:hi]
            report_nonclose(
                kfoc._ggT[gi], block, rtol=1e-3, atol=1e-5, name=f"bias {gi}"
            )
            continue
        # canonical weight block of the dense GGN: need the canonical
        # permutation; for the MLP, W is [d_in, d_out] with ravel order
        # (in, out) while canonical is [d_out, d_in] -> permute
        lo, hi = ranges[tuple(group.weight_path)]
        block = dense[lo:hi, lo:hi]
        d_out, d_in = group.d_out, group.d_in
        # flat index (in, out) -> canonical (out, in)
        perm = np.arange(d_in * d_out).reshape(d_in, d_out).T.reshape(-1)
        block_canon = block[np.ix_(perm, perm)]
        S1_ref, S2_ref = _dense_vanloan_top_pair(block_canon, d_out, d_in)
        S1, S2 = np.asarray(kfoc._ggT[gi]), np.asarray(kfoc._aaT[gi])
        # compare the Kronecker products (sign ambiguity cancels)
        report_nonclose(
            np.kron(S1, S2),
            np.kron(S1_ref, S2_ref),
            rtol=5e-3,
            atol=1e-4,
            name=f"kfoc block {gi}",
        )


def test_kfoc_rejects_multi_batch_and_bad_config():
    case = make_case("mlp_ce_mean")
    with pytest.raises(ValueError, match="single batch"):
        KFOCLinearOperator(
            case["model_fn"], case["loss_fn"], case["params"], case["data"],
            check_deterministic=False,
        )
    X, y = case["data"][0]
    with pytest.raises(ValueError, match="TYPE2/MC"):
        KFOCLinearOperator(
            case["model_fn"], case["loss_fn"], case["params"], [(X, y)],
            fisher_type=FisherType.EMPIRICAL, mc_samples=1,
            check_deterministic=False,
        )


def test_kfoc_zero_ggn_block():
    """A layer with zero gradients yields zero factors (no divergence)."""
    import curvlinops_tpu as cl

    key = jax.random.key(0)
    params = {
        "W1": 0.3 * jax.random.normal(key, (4, 3)),
        "W2": jnp.zeros((3, 2)),  # zero weight kills gradients through W1
    }

    def model(p, x):
        return (x @ p["W1"]) @ p["W2"]

    X = jax.random.normal(jax.random.key(1), (5, 4))
    y = jax.random.normal(jax.random.key(2), (5, 2))
    kfoc = KFOCLinearOperator(
        model, cl.MSELoss("mean"), params, [(X, y)],
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    gi = [i for i, g in enumerate(kfoc.groups) if g.weight_path == jax.tree_util.tree_flatten_with_path(params)[0][0][0]]
    # W1's block: gradients are zero because W2 == 0
    w1_group = [i for i, g in enumerate(kfoc.groups)
                if "W1" in str(g.weight_path)][0]
    assert float(jnp.abs(kfoc._ggT[w1_group]).max()) == 0.0
    assert float(jnp.abs(kfoc._aaT[w1_group]).max()) == 0.0


def test_batched_eigh_matches_sequential():
    from curvlinops_tpu.kfac.chain import batched_eigh

    key = jax.random.key(42)
    mats = {}
    for i, n in enumerate([4, 4, 6, 4, 6]):
        k = jax.random.fold_in(key, i)
        A = jax.random.normal(k, (n, n))
        mats[i] = A @ A.T + jnp.eye(n)
    out = batched_eigh(mats)
    for i, m in mats.items():
        w_ref, v_ref = jnp.linalg.eigh(m)
        w, v = out[i]
        report_nonclose(w, w_ref, rtol=1e-5, atol=1e-6, name=f"eigvals {i}")
        # eigenvectors up to sign: compare reconstructions
        report_nonclose(
            (v * w) @ v.T, np.asarray(m), rtol=1e-4, atol=1e-5,
            name=f"reconstruction {i}",
        )


def test_ekfac_exact_damped_inverse_after_batched_eigh():
    """Exact-damped KFAC inverse (batched-eigh path) still matches dense."""
    from curvlinops_tpu.kfac.operator import KFACLinearOperator as K

    case = _make_linear_case("mean")
    kfac = K(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    dense = np.asarray(kfac.todense())
    inv = kfac.inverse(damping=0.5, use_exact_damping=True)
    v = np.random.default_rng(8).standard_normal(len(dense)).astype(np.float32)
    expected = np.linalg.solve(dense + 0.5 * np.eye(len(dense)), v)
    report_nonclose(inv @ v, expected, rtol=5e-3, atol=1e-4, name="exact inv")


def test_kfoc_power_iteration_converges_near_degenerate():
    """A near-degenerate top pair (sigma2/sigma1 ~ 0.998) converges to the
    dense-SVD factors via the residual-driven while_loop (a fixed 200-step
    power loop leaves ~45% of the subdominant direction in the factor)."""
    from curvlinops_tpu.kfac.kfoc import top_rank_one_kron_factors

    d = 3
    # G = S1 (x) S2 + 0.998 * T1 (x) T2 with trace-orthogonal rank-one PSD
    # factors: the Van Loan rearrangement has singular values exactly
    # {1, 0.998}
    u1, u2 = np.eye(d)[:, 0], np.eye(d)[:, 1]
    q = np.linalg.qr(np.random.default_rng(0).normal(size=(d, d)))[0]
    w1, w2 = q[:, 0], q[:, 1]
    G = np.kron(np.outer(u1, u1), np.outer(w1, w1)) + 0.998 * np.kron(
        np.outer(u2, u2), np.outer(w2, w2)
    )
    # synthesize per-sample gradients with exactly this GGN block
    evals, evecs = np.linalg.eigh(G)
    evals = np.clip(evals, 0.0, None)
    P = (np.sqrt(evals)[:, None] * evecs.T).reshape(-1, d, d)[None]
    P = jnp.asarray(P, jnp.float32)  # [V=1, N=d*d, d, d]

    S1, S2, info = top_rank_one_kron_factors(P)
    assert int(info["iterations"]) > 200  # genuinely needed the extra steps
    S1_ref, S2_ref = _dense_vanloan_top_pair(G, d, d)
    report_nonclose(
        np.kron(np.asarray(S1), np.asarray(S2)),
        np.kron(S1_ref, S2_ref),
        rtol=5e-3,
        atol=5e-4,  # float32 eigenvector floor for a 0.002 spectral gap
        name="near-degenerate kfoc pair",
    )


def test_kfoc_power_iteration_early_stop_well_separated():
    """Well-separated pairs stop far below the cap and report the residual."""
    from curvlinops_tpu.kfac.kfoc import top_rank_one_kron_factors

    key = jax.random.key(3)
    P = jax.random.normal(key, (2, 4, 3, 5))
    S1, S2, info = top_rank_one_kron_factors(P, tol=1e-6)
    assert int(info["iterations"]) < 200
    assert float(info["residual"]) <= 1e-6
    assert float(info["sigma"]) > 0


def test_kfoc_power_iteration_stagnation_stop():
    """With an unreachable tolerance the stagnation rule stops at the f32
    residual floor instead of burning the full iteration cap (the default
    eps-scale tol sits above the floor only for small problems)."""
    from curvlinops_tpu.kfac.kfoc import top_rank_one_kron_factors

    P = jax.random.normal(jax.random.key(5), (1, 8, 16, 48), jnp.float32)
    _, _, info = top_rank_one_kron_factors(P, num_iters=2000, tol=0.0)
    assert int(info["iterations"]) < 500  # stopped at the floor, not the cap
    assert float(info["residual"]) < 1e-5  # and the floor is converged


def test_kfoc_operator_exposes_power_info():
    case = make_case("mlp_ce_mean")
    X, y = case["data"][0]
    kfoc = KFOCLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], [(X, y)],
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    weight_groups = [
        gi for gi, g in enumerate(kfoc.groups) if g.weight_path is not None
    ]
    assert set(kfoc.power_info) == set(weight_groups)
    for gi in weight_groups:
        assert float(kfoc.power_info[gi]["residual"]) < 1e-5


def _shared_seq_case(flatten=True, nonlinear=False, seed=50, reduction="mean"):
    """Deep net applied per-position over a sequence, output flattened to 2d.

    The reference's EKFAC weight-sharing cases flatten the output because
    EKFAC only supports 2d outputs (``test/test_ekfac.py:121-188``,
    'expand-flatten' setting); sharing lives inside the model.
    """
    from curvlinops_tpu import MSELoss
    from tests.cases import _mlp_params

    params = _mlp_params(jax.random.key(seed), [4, 3, 2])

    def model(p, x):  # x: [B, S, 4]
        for i in range(len(p)):
            x = x @ p[f"layer{i}"]["W"] + p[f"layer{i}"]["b"]
            if nonlinear and i < len(p) - 1:
                x = jnp.tanh(x)
        return x.reshape(x.shape[0], -1) if flatten else x

    X = jax.random.normal(jax.random.key(seed + 1), (6, 5, 4))
    y = jax.random.normal(jax.random.key(seed + 2), (6, 10))
    return dict(model_fn=model, loss_fn=MSELoss(reduction), params=params,
                data=[(X, y)])


@pytest.mark.parametrize("separate", [True, False], ids=["separate", "joint"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_ekfac_expand_flatten_weight_sharing_exact(reduction, separate):
    """Deep linear sharing + flattened output: EKFAC == block-diag GGN
    (reference ``test_ekfac.py:121`` 'expand-flatten')."""
    case = _shared_seq_case(reduction=reduction)
    ekfac = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        fisher_type=FisherType.TYPE2, check_deterministic=False,
        separate_weight_and_bias=separate,
    )
    dense = dense_ggn(case["model_fn"], case["loss_fn"], case["params"],
                      case["data"])
    expected = blockdiag_projection(dense, case["params"], ekfac.groups)
    report_nonclose(ekfac.todense(), expected, rtol=1e-3, atol=1e-5,
                    name="ekfac sharing")


def test_ekfac_closer_than_kfac_weight_sharing():
    """EKFAC at least as close as KFAC under weight sharing
    (reference ``test_ekfac.py:681``)."""
    case = _shared_seq_case(nonlinear=True)
    kw = dict(fisher_type=FisherType.TYPE2, check_deterministic=False)
    kfac = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"], **kw
    )
    ekfac = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"], **kw
    )
    dense = dense_ggn(case["model_fn"], case["loss_fn"], case["params"],
                      case["data"])
    target = blockdiag_projection(dense, case["params"], kfac.groups)
    err_kfac = np.linalg.norm(np.asarray(kfac.todense()) - target)
    err_ekfac = np.linalg.norm(np.asarray(ekfac.todense()) - target)
    assert err_ekfac <= err_kfac * (1 + 1e-5), (err_ekfac, err_kfac)


def test_ekfac_properties_match_dense():
    """trace/det/logdet/frobenius of EKFAC against its dense matrix
    (reference ``test_ekfac.py:586-643``)."""
    case = _shared_seq_case(nonlinear=True)
    ekfac = EKFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        fisher_type=FisherType.TYPE2, check_deterministic=False,
    )
    dense = np.asarray(ekfac.todense(), dtype=np.float64)
    report_nonclose(ekfac.trace(), np.trace(dense), rtol=1e-4, name="trace")
    report_nonclose(
        ekfac.frobenius_norm(), np.linalg.norm(dense), rtol=1e-4, name="fro"
    )
    sign, logdet = np.linalg.slogdet(dense)
    if sign > 0 and np.isfinite(logdet):
        report_nonclose(ekfac.logdet(), logdet, rtol=1e-3, atol=1e-4,
                        name="logdet")
    report_nonclose(ekfac.det(), sign * np.exp(logdet), rtol=1e-3, atol=1e-6,
                    name="det")
