"""Randomized low-rank exact-damped inversion (`kfac/randomized.py`).

Oracles, tightest first:

- the 4-sector damped-inverse algebra is checked EXACTLY (no randomness
  tolerance) against the dense inverse of explicitly reconstructed
  ``U diag(lam) U^T + tail (I - U U^T)`` factors;
- ``randomized_eigh`` at ``rank >= D`` must equal the exact ``eigh``;
- end-to-end ``inverse(rank=r)``: with the batch small enough that every
  factor's TRUE rank is below ``r``, the randomized range finder captures
  the whole spectrum and the inverse must match the exact-damped one to
  float tolerance (the trace-preserving tail is ~0 there);
- the scan-stacked path must match its own exact-damped build the same way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import KFACLinearOperator
from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator
from curvlinops_tpu.kfac.randomized import (
    batched_randomized_eigh,
    lr_apply,
    lr_apply_stacked,
    lr_corrected_data,
    lr_damped_inverse_data,
    lr_sector_stats,
    orthonormal_range,
    randomized_eigh,
)
from curvlinops_tpu.losses import MSELoss

from tests.utils import report_nonclose


def _rand_psd(key, d, decay=1.0):
    k1, k2 = jax.random.split(key)
    Q, _ = jnp.linalg.qr(jax.random.normal(k1, (d, d)))
    lam = jnp.exp(-decay * jnp.arange(d, dtype=jnp.float32))
    return (Q * lam) @ Q.T


def _orthonormal(key, d, r):
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (d, r)))
    return Q


# ---------------------------------------------------------------------------
# sector algebra: exact, no randomness involved
# ---------------------------------------------------------------------------


def test_sector_inverse_matches_dense():
    """lr_apply == dense inverse of the reconstructed damped Kronecker."""
    dA, rA, dG, rG, delta = 7, 3, 5, 2, 0.3
    kA, kG, kv = jax.random.split(jax.random.key(0), 3)
    U_A = _orthonormal(kA, dA, rA)
    U_G = _orthonormal(kG, dG, rG)
    lam_A = jnp.array([2.0, 1.0, 0.5])
    lam_G = jnp.array([1.5, 0.25])
    a, b = jnp.asarray(0.1), jnp.asarray(0.05)

    A_hat = (U_A * lam_A) @ U_A.T + a * (jnp.eye(dA) - U_A @ U_A.T)
    G_hat = (U_G * lam_G) @ U_G.T + b * (jnp.eye(dG) - U_G @ U_G.T)
    dense = np.kron(np.asarray(A_hat), np.asarray(G_hat))
    dense += delta * np.eye(dA * dG)

    data = lr_damped_inverse_data((lam_A, U_A, a), (lam_G, U_G, b), delta)
    M = jax.random.normal(kv, (dA * dG, 4))
    out = lr_apply(data, M)
    expected = np.linalg.solve(dense, np.asarray(M))
    report_nonclose(out, expected, rtol=1e-4, atol=1e-5, name="sector inverse")


def test_sector_inverse_full_rank_degenerates_exactly():
    """rA == dA, rG == dG: the sector formula IS the exact eigh inverse."""
    dA, dG, delta = 6, 4, 0.2
    kA, kG, kv = jax.random.split(jax.random.key(1), 3)
    A = _rand_psd(kA, dA)
    G = _rand_psd(kG, dG)
    lam_A, U_A = jnp.linalg.eigh(A)
    lam_G, U_G = jnp.linalg.eigh(G)
    zero = jnp.asarray(0.0)
    data = lr_damped_inverse_data((lam_A, U_A, zero), (lam_G, U_G, zero), delta)
    M = jax.random.normal(kv, (dA * dG, 3))
    dense = np.kron(np.asarray(A), np.asarray(G)) + delta * np.eye(dA * dG)
    report_nonclose(
        lr_apply(data, M),
        np.linalg.solve(dense, np.asarray(M)),
        rtol=1e-4,
        atol=1e-5,
        name="full-rank sector",
    )


def test_stacked_sector_inverse_matches_per_slice():
    L, dA, rA, dG, rG, delta = 3, 5, 2, 4, 3, 0.15
    keys = jax.random.split(jax.random.key(2), 2 * L + 1)
    U_As = jnp.stack([_orthonormal(keys[i], dA, rA) for i in range(L)])
    U_Gs = jnp.stack([_orthonormal(keys[L + i], dG, rG) for i in range(L)])
    lam_As = jnp.abs(jax.random.normal(keys[-1], (L, rA))) + 0.2
    lam_Gs = jnp.abs(jax.random.normal(keys[-1], (L, rG))) + 0.1
    tails_A = jnp.array([0.05, 0.0, 0.3])
    tails_G = jnp.array([0.02, 0.4, 0.0])

    data = lr_damped_inverse_data(
        (lam_As, U_As, tails_A), (lam_Gs, U_Gs, tails_G), delta
    )
    M = jax.random.normal(jax.random.key(3), (L * dA * dG, 2))
    out = lr_apply_stacked(data, M)
    for l in range(L):
        sl = lr_damped_inverse_data(
            (lam_As[l], U_As[l], tails_A[l]),
            (lam_Gs[l], U_Gs[l], tails_G[l]),
            delta,
        )
        seg = M.reshape(L, dA * dG, -1)[l]
        report_nonclose(
            out.reshape(L, dA * dG, -1)[l],
            lr_apply(sl, seg),
            rtol=1e-5,
            atol=1e-6,
            name=f"stacked slice {l}",
        )


# ---------------------------------------------------------------------------
# randomized eigendecomposition
# ---------------------------------------------------------------------------


def test_orthonormal_range():
    Y = jax.random.normal(jax.random.key(4), (3, 20, 6))
    Q = orthonormal_range(Y)
    eye = jnp.einsum("bdr,bds->brs", Q, Q)
    report_nonclose(
        eye, jnp.broadcast_to(jnp.eye(6), eye.shape), atol=1e-5, name="QtQ"
    )


def test_orthonormal_range_extreme_spectrum():
    """Householder QR keeps FULL orthonormality on a power-law-2 spectrum.

    Regression for the round-3 Gram-based orthonormalization, whose squared
    dynamic range capped the effective captured rank at ~15 directions in f32
    (the non-monotone quality curve VERDICT round 3 flagged).
    """
    D, r = 512, 128
    key = jax.random.key(12)
    B = jax.random.normal(key, (D, D)) / jnp.sqrt(D)
    lam = (1.0 + jnp.arange(D, dtype=jnp.float32)) ** (-2.0)
    S = jnp.einsum("de,e,fe->df", B, lam, B)
    Y = S @ jax.random.normal(jax.random.key(13), (D, r))
    Q = orthonormal_range(Y)
    G = Q.T @ Q
    assert float(jnp.abs(G - jnp.eye(r)).max()) < 1e-4
    # every column is a real basis vector — no silent rank collapse
    assert float(jnp.linalg.norm(Q, axis=0).min()) > 0.99


def test_randomized_eigh_quality_monotone_in_rank():
    """More rank must mean a (weakly) better reconstruction.

    The direct regression test for the round-3 bug: with the Gram-based
    range finder, rank 512 reconstructed WORSE than rank 128 because almost
    all basis columns were zeroed by the noise threshold.
    """
    D = 768
    B = jax.random.normal(jax.random.key(20), (D, D)) / jnp.sqrt(D)
    lam = (1.0 + jnp.arange(D, dtype=jnp.float32)) ** (-2.0)
    S = jnp.einsum("de,e,fe->df", B, lam, B)
    errs = []
    for rank in (64, 128, 256):
        lam_r, U, tail = randomized_eigh(S, rank, jax.random.key(1))
        approx = (U * lam_r) @ U.T + tail * (jnp.eye(D) - U @ U.T)
        errs.append(float(jnp.linalg.norm(approx - S) / jnp.linalg.norm(S)))
    assert errs[0] > errs[1] > errs[2], errs
    # and the basis must be genuinely orthonormal at every rank
    assert float(jnp.abs(U.T @ U - jnp.eye(256)).max()) < 1e-4


def test_randomized_eigh_full_rank_is_exact():
    S = _rand_psd(jax.random.key(5), 8)
    lam, U, tail = randomized_eigh(S, rank=8, key=jax.random.key(0))
    w, V = jnp.linalg.eigh(S)
    report_nonclose(lam, w, rtol=1e-5, atol=1e-6, name="eigenvalues")
    assert float(tail) == 0.0
    report_nonclose((U * lam) @ U.T, S, rtol=1e-4, atol=1e-5, name="recon")


def test_randomized_eigh_captures_low_rank_exactly():
    """A matrix of true rank k is reproduced by rank >= k range finding."""
    d, k = 24, 5
    B = jax.random.normal(jax.random.key(6), (d, k))
    S = B @ B.T
    lam, U, tail = randomized_eigh(S, rank=8, key=jax.random.key(1))
    report_nonclose((U * lam) @ U.T, S, rtol=1e-3, atol=1e-4, name="recon")
    # f32 trace cancellation leaves roundoff-scale residue in the tail
    assert float(tail) <= 1e-5 * float(jnp.trace(S))


def test_randomized_eigh_trace_preserving_tail():
    S = _rand_psd(jax.random.key(7), 16, decay=0.5)
    rank = 6
    lam, U, tail = randomized_eigh(S, rank=rank, key=jax.random.key(2))
    approx_trace = float(lam.sum() + tail * (16 - rank))
    report_nonclose(
        approx_trace, float(jnp.trace(S)), rtol=1e-5, name="trace preserved"
    )
    assert float(tail) >= 0.0


def test_batched_randomized_eigh_shapes_and_stacks():
    mats = {
        "a": _rand_psd(jax.random.key(8), 12),
        "b": _rand_psd(jax.random.key(9), 12, decay=0.3),
        "small": _rand_psd(jax.random.key(10), 3),
        "stk": jnp.stack(
            [_rand_psd(jax.random.key(11 + i), 10) for i in range(4)]
        ),
    }
    out = batched_randomized_eigh(mats, rank=6, key=jax.random.key(3))
    assert out["a"][0].shape == (6,) and out["a"][1].shape == (12, 6)
    # D <= rank: exact fallback, full basis, zero tail
    assert out["small"][0].shape == (3,) and out["small"][1].shape == (3, 3)
    assert float(out["small"][2]) == 0.0
    w, V = jnp.linalg.eigh(mats["small"])
    report_nonclose(out["small"][0], w, rtol=1e-5, atol=1e-6, name="small")
    # stacked values keep their leading axis
    assert out["stk"][0].shape == (4, 6)
    assert out["stk"][1].shape == (4, 10, 6)
    assert out["stk"][2].shape == (4,)
    # reconstructions track the originals; the slow-decay spectrum ("b",
    # decay 0.3) keeps ~15% of its Frobenius mass past rank 6 even with the
    # trace-preserving tail, so the bound is loose by design
    for k, bound in (("a", 0.02), ("b", 0.20)):
        lam, U, tail = out[k]
        S = mats[k]
        recon = (U * lam) @ U.T + tail * (jnp.eye(12) - U @ U.T)
        assert (
            float(jnp.linalg.norm(recon - S)) / float(jnp.linalg.norm(S))
            < bound
        )


# ---------------------------------------------------------------------------
# end-to-end: KFAC inverse with rank=
# ---------------------------------------------------------------------------


def _mlp_case(widths, batch, seed=0):
    key = jax.random.key(seed)
    params = {}
    dims = widths
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

    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (batch, dims[0]))
    y = jax.random.normal(ky, (batch, dims[-1]))
    return model_fn, params, [(np.asarray(X), np.asarray(y))]


def test_kfac_inverse_rank_matches_exact_on_captured_spectra():
    """Batch 4, MSE: every factor's true rank is far below rank=14, so the
    randomized path must agree with the exact eigh path to float tolerance
    (the trace-preserving tails are ~0)."""
    model_fn, params, data = _mlp_case([20, 18, 16, 3], batch=4)
    kfac = KFACLinearOperator(
        model_fn, MSELoss("mean"), params, data, check_deterministic=False
    )
    # NOTE the damped inverse amplifies f32 factor roundoff (~1e-6 * lam_max)
    # by lam_max / delta^2 — at delta=1e-2 the exact and randomized paths
    # amplify DIFFERENT noise to ~5e-2 absolute; delta=0.1 keeps the
    # comparison about the algorithm, not the conditioning
    delta = 0.1
    exact = kfac.inverse(damping=delta, use_exact_damping=True)
    lowrank = kfac.inverse(
        damping=delta, use_exact_damping=True, rank=14, rank_power_iters=2
    )
    kinds = {kind for kind, _ in lowrank._blocks_data.values()}
    assert "lreigh" in kinds, kinds
    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(42), a.shape), params
    )
    out_lr, out_ex = lowrank @ v, exact @ v
    for (pa, la), (_, le) in zip(
        jax.tree_util.tree_leaves_with_path(out_lr),
        jax.tree_util.tree_leaves_with_path(out_ex),
    ):
        report_nonclose(la, le, rtol=5e-3, atol=2e-4, name=str(pa))


def test_kfac_inverse_rank_deterministic_default_key():
    model_fn, params, data = _mlp_case([20, 18, 16, 3], batch=4, seed=1)
    kfac = KFACLinearOperator(
        model_fn, MSELoss("mean"), params, data, check_deterministic=False
    )
    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(7), a.shape), params
    )
    r1 = kfac.inverse(damping=0.1, use_exact_damping=True, rank=8) @ v
    r2 = kfac.inverse(damping=0.1, use_exact_damping=True, rank=8) @ v
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(r1),
        jax.tree_util.tree_leaves_with_path(r2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), str(pa))


def test_kfac_inverse_rank_covers_single_factor_bias_blocks():
    """Bias-only blocks larger than ``rank`` must ride the lr path too.

    ``kron(S, [[1]]) == S`` makes the trivial-second-factor embedding
    exact; without it a 124M GPT's 48 bias blocks went through full eigh
    and dominated the whole rank-r build (measured 8.6 s of a ~9 s build).
    """
    model_fn, params, data = _mlp_case([20, 18, 16, 3], batch=4)
    kfac = KFACLinearOperator(
        model_fn, MSELoss("mean"), params, data, check_deterministic=False
    )
    inv = kfac.inverse(
        damping=0.1, use_exact_damping=True, rank=14, rank_power_iters=2
    )
    # blocks 1/3 are the 18-/16-dim bias blocks: both must be low-rank now
    bias_kinds = [
        kind
        for gi, (kind, factors) in sorted(inv._blocks_data.items())
        if gi in (1, 3)
    ]
    assert bias_kinds == ["lreigh", "lreigh"], inv._blocks_data.keys()
    # and the 3-dim bias block stays exact
    assert inv._blocks_data[5][0] == "eigh"


def test_ekfac_rank_covers_single_factor_bias_blocks():
    """EKFAC(rank=) bias-only groups ride the sector path (trivial a-side)
    and agree with the full build at captured spectra."""
    from curvlinops_tpu import EKFACLinearOperator

    model_fn, params, data = _mlp_case([20, 18, 16, 3], batch=4)
    ek = EKFACLinearOperator(
        model_fn, MSELoss("mean"), params, data,
        check_deterministic=False, rank=14, rank_power_iters=2,
    )
    assert ek._blocks_data[1][0] == "lreigh"  # 18-dim bias
    assert ek._blocks_data[3][0] == "lreigh"  # 16-dim bias
    assert ek._blocks_data[5][0] == "eigh"  # 3-dim bias stays exact
    ek_full = EKFACLinearOperator(
        model_fn, MSELoss("mean"), params, data, check_deterministic=False
    )
    v = np.random.default_rng(0).standard_normal(ek.shape[0]).astype(np.float32)
    ref = ek_full @ v
    assert np.linalg.norm(ek @ v - ref) / np.linalg.norm(ref) < 1e-4
    ref_inv = ek_full.inverse(0.1) @ v
    assert (
        np.linalg.norm(ek.inverse(0.1) @ v - ref_inv) / np.linalg.norm(ref_inv)
        < 1e-4
    )


def test_kfac_inverse_rank_small_blocks_stay_exact():
    """Blocks whose factors are all <= rank keep the exact eigh path."""
    model_fn, params, data = _mlp_case([6, 5, 4], batch=4, seed=2)
    kfac = KFACLinearOperator(
        model_fn, MSELoss("mean"), params, data, check_deterministic=False
    )
    inv = kfac.inverse(damping=0.1, use_exact_damping=True, rank=32)
    kinds = {kind for kind, _ in inv._blocks_data.values()}
    assert kinds <= {"eigh", "seigh", "eighd"}, kinds


def test_rank_requires_exact_damping():
    model_fn, params, data = _mlp_case([6, 5, 4], batch=2, seed=3)
    kfac = KFACLinearOperator(
        model_fn, MSELoss("mean"), params, data, check_deterministic=False
    )
    with pytest.raises(ValueError, match="use_exact_damping"):
        kfac.inverse(damping=0.1, rank=4)
    with pytest.raises(ValueError, match="positive int"):
        kfac.inverse(damping=0.1, use_exact_damping=True, rank=0)


def test_scan_stacked_inverse_rank_matches_exact():
    """Scan-stacked blocks route through the batched stacked lr apply."""
    L, d, B = 3, 12, 3
    key = jax.random.key(11)
    kW, kx, ky, kh = jax.random.split(key, 4)
    Ws = 0.4 * jax.random.normal(kW, (L, d, d))

    def model_fn(p, x):
        def body(h, W):
            return jnp.tanh(h @ W), None

        h, _ = jax.lax.scan(body, x, p["stack"]["W"])
        return h @ p["head"]["W"]

    params = {"stack": {"W": Ws}, "head": {"W": 0.4 * jax.random.normal(kh, (d, d))}}
    X = jax.random.normal(kx, (B, d))
    y = jax.random.normal(ky, (B, d))
    kfac = KFACLinearOperator(
        model_fn,
        MSELoss("mean"),
        params,
        [(np.asarray(X), np.asarray(y))],
        check_deterministic=False,
    )
    delta = 0.1  # see the conditioning note in the dense-MLP test above
    exact = kfac.inverse(damping=delta, use_exact_damping=True)
    lowrank = kfac.inverse(
        damping=delta, use_exact_damping=True, rank=10, rank_power_iters=2
    )
    kinds = {kind for kind, _ in lowrank._blocks_data.values()}
    assert "slreigh" in kinds, kinds
    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(5), a.shape), params
    )
    out_lr, out_ex = lowrank @ v, exact @ v
    for (pa, la), (_, le) in zip(
        jax.tree_util.tree_leaves_with_path(out_lr),
        jax.tree_util.tree_leaves_with_path(out_ex),
    ):
        report_nonclose(la, le, rtol=5e-3, atol=2e-4, name=str(pa))


# ---------------------------------------------------------------------------
# rank-r EKFAC: sector statistics + end-to-end
# ---------------------------------------------------------------------------


def test_lr_sector_stats_match_dense():
    """The four sector sums equal brute-force dense per-sample gradients."""
    V, B, S, D1, D2, r1, r2 = 2, 3, 4, 7, 6, 3, 2
    kg, ka, k1, k2 = jax.random.split(jax.random.key(20), 4)
    g = jax.random.normal(kg, (V, B, S, D1))
    a = jax.random.normal(ka, (B, S, D2))
    U_g = _orthonormal(k1, D1, r1)
    U_a = _orthonormal(k2, D2, r2)

    lam11, row_g, col_a, total = lr_sector_stats(g, U_g, a, U_a)

    P = np.einsum("vbsi,bsj->vbij", np.asarray(g), np.asarray(a))
    lam11_ref = np.einsum(
        "id,vbij,je->vbde", np.asarray(U_g), P, np.asarray(U_a)
    )
    lam11_ref = (lam11_ref**2).sum((0, 1))
    row_ref = (np.einsum("id,vbij->vbdj", np.asarray(U_g), P) ** 2).sum(
        (0, 1, 3)
    )
    col_ref = (np.einsum("vbij,je->vbie", P, np.asarray(U_a)) ** 2).sum(
        (0, 1, 2)
    )
    total_ref = (P**2).sum()
    report_nonclose(lam11, lam11_ref, rtol=1e-4, atol=1e-5, name="lam11")
    report_nonclose(row_g, row_ref, rtol=1e-4, atol=1e-5, name="row_g")
    report_nonclose(col_a, col_ref, rtol=1e-4, atol=1e-5, name="col_a")
    report_nonclose(total, total_ref, rtol=1e-4, atol=1e-4, name="total")


def test_lr_corrected_data_inclusion_exclusion():
    """Sector means are the inclusion-exclusion residues / complement dims."""
    r1, r2, D1, D2 = 2, 3, 5, 7
    k1, k2, ks = jax.random.split(jax.random.key(21), 3)
    U_g = _orthonormal(k1, D1, r1)
    U_a = _orthonormal(k2, D2, r2)
    lam11 = jnp.abs(jax.random.normal(ks, (r1, r2)))
    row = lam11.sum(-1) + 3.0
    col = lam11.sum(-2) + 5.0
    total = float(row.sum() + col.sum() - lam11.sum()) + 11.0
    _, _, S11, s12, s21, s22 = lr_corrected_data(
        U_g, U_a, (lam11, row, col, jnp.asarray(total))
    )
    report_nonclose(S11, lam11, name="S11")
    report_nonclose(s12, jnp.full((r1,), 3.0 / (D2 - r2)), name="s12")
    report_nonclose(s21, jnp.full((r2,), 5.0 / (D1 - r1)), name="s21")
    report_nonclose(
        s22, 11.0 / ((D1 - r1) * (D2 - r2)), rtol=1e-5, name="s22"
    )


def test_ekfac_rank_exact_at_full_capture():
    """ONE datum: every factor's true rank (and the f32-resolvable part of
    its spectrum) sits far above the range finder's capture threshold, so
    the rank-r EKFAC equals the exact one to float tolerance.

    NOTE larger batches spread the factor spectra across the Gram
    orthonormalization's per-iteration capture floor (~1e-3 relative in
    f32) — there the rank path is a measured APPROXIMATION, not an equal
    (see test_ekfac_rank_approximation_quality)."""
    model_fn, params, data = _mlp_case([20, 18, 16, 3], batch=1, seed=4)
    kw = dict(check_deterministic=False, fisher_type="type-2")
    exact = EKFACLinearOperator(model_fn, MSELoss("mean"), params, data, **kw)
    lowrank = EKFACLinearOperator(
        model_fn, MSELoss("mean"), params, data,
        rank=14, rank_power_iters=1, **kw,
    )
    kinds = {kind for kind, _ in lowrank._blocks_data.values()}
    assert "lreigh" in kinds, kinds
    de = np.asarray(exact.todense())
    dl = np.asarray(lowrank.todense())
    rel = np.linalg.norm(dl - de) / np.linalg.norm(de)
    assert rel < 1e-4, rel
    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(42), a.shape), params
    )
    inv_lr = lowrank.inverse(damping=0.1) @ v
    inv_ex = exact.inverse(damping=0.1) @ v
    for (pa, la), (_, le) in zip(
        jax.tree_util.tree_leaves_with_path(inv_lr),
        jax.tree_util.tree_leaves_with_path(inv_ex),
    ):
        report_nonclose(la, le, rtol=5e-3, atol=2e-4, name=f"inverse {pa}")


def test_ekfac_rank_approximation_quality():
    """Batch 4: the spectra straddle the f32 capture floor; the sector
    operator must still track the exact EKFAC to ~1% in operator norm and
    its damped inverse to a few percent (the displaced tail mass is
    bounded by the inclusion-exclusion bookkeeping)."""
    model_fn, params, data = _mlp_case([20, 18, 16, 3], batch=4, seed=4)
    kw = dict(check_deterministic=False, fisher_type="type-2")
    exact = EKFACLinearOperator(model_fn, MSELoss("mean"), params, data, **kw)
    lowrank = EKFACLinearOperator(
        model_fn, MSELoss("mean"), params, data,
        rank=14, rank_power_iters=1, **kw,
    )
    de = np.asarray(exact.todense())
    dl = np.asarray(lowrank.todense())
    rel = np.linalg.norm(dl - de) / np.linalg.norm(de)
    assert rel < 1.5e-2, rel
    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(42), a.shape), params
    )
    inv_lr = lowrank.inverse(damping=0.1) @ v
    inv_ex = exact.inverse(damping=0.1) @ v
    for (pa, la), (_, le) in zip(
        jax.tree_util.tree_leaves_with_path(inv_lr),
        jax.tree_util.tree_leaves_with_path(inv_ex),
    ):
        nrel = float(
            np.linalg.norm(np.asarray(la) - np.asarray(le))
            / (np.linalg.norm(np.asarray(le)) + 1e-30)
        )
        assert nrel < 4e-2, (pa, nrel)


def test_ekfac_rank_scan_stacked_tracks_exact():
    L, d, B = 3, 12, 3
    key = jax.random.key(22)
    kW, kx, ky, kh = jax.random.split(key, 4)
    Ws = 0.4 * jax.random.normal(kW, (L, d, d))

    def model_fn(p, x):
        def body(h, W):
            return jnp.tanh(h @ W), None

        h, _ = jax.lax.scan(body, x, p["stack"]["W"])
        return h @ p["head"]["W"]

    params = {
        "stack": {"W": Ws},
        "head": {"W": 0.4 * jax.random.normal(kh, (d, d))},
    }
    X = jax.random.normal(kx, (B, d))
    y = jax.random.normal(ky, (B, d))
    data = [(np.asarray(X), np.asarray(y))]
    kw = dict(check_deterministic=False, fisher_type="type-2")
    exact = EKFACLinearOperator(model_fn, MSELoss("mean"), params, data, **kw)
    lowrank = EKFACLinearOperator(
        model_fn, MSELoss("mean"), params, data,
        rank=10, rank_power_iters=1, **kw,
    )
    kinds = {kind for kind, _ in lowrank._blocks_data.values()}
    assert "slreigh" in kinds, kinds
    de = np.asarray(exact.todense())
    dl = np.asarray(lowrank.todense())
    rel = np.linalg.norm(dl - de) / np.linalg.norm(de)
    assert rel < 2e-2, rel


def test_ekfac_rank_matrix_properties_match_dense():
    """trace/frobenius/logdet closed forms vs the densified operator."""
    model_fn, params, data = _mlp_case([16, 14, 3], batch=4, seed=5)
    ek = EKFACLinearOperator(
        model_fn, MSELoss("mean"), params, data,
        rank=8, check_deterministic=False, fisher_type="type-2",
    )
    kinds = {kind for kind, _ in ek._blocks_data.values()}
    assert "lreigh" in kinds, kinds
    dense = np.asarray(ek.todense(), dtype=np.float64)
    report_nonclose(ek.trace(), np.trace(dense), rtol=1e-3, name="trace")
    report_nonclose(
        ek.frobenius_norm(),
        np.linalg.norm(dense),
        rtol=1e-3,
        name="frobenius",
    )
    # damped inverse has a strictly positive spectrum -> finite logdet
    inv = ek.inverse(damping=0.5)
    dense_inv = np.asarray(inv.todense(), dtype=np.float64)
    sign, ld = np.linalg.slogdet(dense_inv)
    assert sign > 0
    report_nonclose(inv.ops[1].logdet(), ld, rtol=1e-3, name="logdet")
    report_nonclose(
        inv.ops[1].trace(), np.trace(dense_inv), rtol=1e-3, name="inv trace"
    )


def test_ekfac_rank_state_dict_roundtrip():
    model_fn, params, data = _mlp_case([20, 18, 3], batch=4, seed=6)
    kw = dict(check_deterministic=False, fisher_type="type-2", rank=12)
    ek = EKFACLinearOperator(model_fn, MSELoss("mean"), params, data, **kw)
    state = jax.tree.map(np.asarray, ek.state_dict())
    restored = EKFACLinearOperator.from_state_dict(
        state, model_fn, MSELoss("mean"), params, data, **kw
    )
    v = jax.tree.map(
        lambda a: jax.random.normal(jax.random.key(8), a.shape), params
    )
    a, b = ek @ v, restored @ v
    for (pa, x1), (_, x2) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2), str(pa))


def test_ekfac_rank_small_blocks_stay_exact():
    model_fn, params, data = _mlp_case([6, 5, 4], batch=4, seed=7)
    ek = EKFACLinearOperator(
        model_fn, MSELoss("mean"), params, data,
        rank=32, check_deterministic=False, fisher_type="type-2",
    )
    kinds = {kind for kind, _ in ek._blocks_data.values()}
    assert kinds <= {"eigh", "seigh", "eighd"}, kinds


def test_ekfac_rank_rejects_bad_rank():
    model_fn, params, data = _mlp_case([6, 5, 4], batch=2, seed=8)
    with pytest.raises(ValueError, match="positive int"):
        EKFACLinearOperator(
            model_fn, MSELoss("mean"), params, data,
            rank=-3, check_deterministic=False,
        )


def test_randomized_eigh_rank_deficient_spectrum_is_psd():
    """Rank-deficient factors must never emit negative eigenvalues.

    Regression: with true rank (40) far below the requested rank (128), the
    QR completion pads the basis with arbitrary directions whose core
    eigenvalues are pure roundoff of EITHER sign — at activation scale ~30
    they reached -0.09, flipping the sign of the 4-sector damped-inverse
    denominator ``lam_A * lam_G + damping`` (|S11| hit 4e6 where the
    intended cap is 1/damping = 1e3).  This is exactly the KFAC small-batch
    case: rank(aaT) <= batch < rank.
    """
    D, true_rank, scale = 512, 40, 30.0
    X = scale * jax.random.normal(jax.random.key(30), (D, true_rank))
    S = X @ X.T / true_rank
    lam, U, tail = randomized_eigh(S, rank=128, key=jax.random.key(31))
    assert float(lam.min()) >= 0.0
    assert float(tail) >= 0.0

    damping = 1e-3
    data = lr_damped_inverse_data((lam, U, tail), (lam, U, tail), damping)
    _, _, S11, s12, s21, s22 = data
    cap = 1.0 / damping
    for name, sec in [("S11", S11), ("s12", s12), ("s21", s21), ("s22", s22)]:
        mx = float(jnp.abs(sec).max())
        assert 0.0 < mx <= cap * (1 + 1e-5), (name, mx)


def test_batched_randomized_eigh_rank_deficient_is_psd():
    """The shape-batched build path needs the same PSD clamp."""
    key = jax.random.key(32)
    mats = {}
    for i, (d, tr) in enumerate([(300, 20), (300, 20), (400, 8)]):
        X = 30.0 * jax.random.normal(jax.random.fold_in(key, i), (d, tr))
        mats[f"m{i}"] = X @ X.T / tr
    out = batched_randomized_eigh(mats, rank=96, key=jax.random.key(33))
    for k, (lam, U, tail) in out.items():
        assert float(lam.min()) >= 0.0, k
        assert float(tail) >= 0.0, k


def test_kfac_inverse_rank_deficient_small_batch_close_to_exact():
    """Operator-level PSD-clamp regression: ``inverse(rank=)`` on a batch
    far smaller than the factor dims (rank(aaT) <= B) must stay close to
    the exact-damped inverse instead of blowing past the 1/damping cap."""
    key = jax.random.key(0)
    k1, k2, kx = jax.random.split(key, 3)
    params = {
        "w1": jax.random.normal(k1, (64, 128)) * 0.3,
        "b1": jnp.zeros(128),
        "w2": jax.random.normal(k2, (128, 4)) * 0.3,
        "b2": jnp.zeros(4),
    }

    def model_fn(p, x):
        return jnp.tanh(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]

    # B=2 << D, activations at scale 30: pre-clamp, the noise directions'
    # negative core eigenvalues drove |inverse @ v| to ~1e6 x the exact one
    X = 30.0 * jax.random.normal(kx, (2, 64))
    Y = jax.random.normal(jax.random.fold_in(kx, 1), (2, 4))
    K = KFACLinearOperator(
        model_fn, MSELoss("mean"), params, [(X, Y)],
        check_deterministic=False,
    )
    v = np.asarray(
        jax.random.normal(jax.random.key(7), (K.shape[1],)), dtype=np.float32
    )
    exact = np.asarray(K.inverse(damping=1e-3, use_exact_damping=True) @ v)
    ranked = np.asarray(
        K.inverse(damping=1e-3, use_exact_damping=True, rank=48) @ v
    )
    assert np.isfinite(ranked).all()
    rel = np.linalg.norm(ranked - exact) / np.linalg.norm(exact)
    assert rel < 0.05, rel
