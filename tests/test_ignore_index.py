"""CrossEntropyLoss ignore_index: torch parity + curvature correctness.

torch's CE (the reference's loss) treats ``ignore_index`` targets (default
-100, the standard NLP padding label) as zero-loss and divides the ``mean``
reduction by the NON-ignored count. jnp's ``take_along_axis`` instead
silently wraps negative indices — the failure mode this suite pins down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import curvlinops_tpu as cl
from curvlinops_tpu.curvature.loss_hessian import (
    loss_hessian_sqrt_columns,
    sample_grad_outputs,
)
from curvlinops_tpu.losses import CrossEntropyLoss

from tests.utils import report_nonclose


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_ce_loss_matches_torch_with_padding(reduction):
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 5)).astype(np.float32)
    target = np.array([0, 4, -100, 2, -100, 1])
    ours = float(
        CrossEntropyLoss(reduction)(jnp.asarray(logits), jnp.asarray(target))
    )
    theirs = float(
        torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(target),
            reduction=reduction,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_ce_loss_matches_torch_sequence_layout(reduction="mean"):
    import torch

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 4, 3)).astype(np.float32)  # [N, C, D]
    target = np.array([[0, -100, 2], [3, 1, -100]])
    ours = float(
        CrossEntropyLoss(reduction)(jnp.asarray(logits), jnp.asarray(target))
    )
    theirs = float(
        torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(target),
            reduction=reduction,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def _padded_problem():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"W": 0.4 * jax.random.normal(k1, (5, 8)),
              "V": 0.4 * jax.random.normal(k2, (8, 4))}

    def model(p, x):  # [B, T, 5] -> [(B*T), 4]
        h = jnp.tanh(x @ p["W"]) @ p["V"]
        return h.reshape(-1, 4)

    X = jax.random.normal(k3, (3, 4, 5))
    y = jax.random.randint(jax.random.key(4), (3, 4), 0, 4)
    # ignore the LAST position of every example (uniform padding)
    y = y.at[:, -1].set(-100).reshape(-1)
    return model, params, X, y


@pytest.mark.parametrize("op_cls", [
    cl.GGNLinearOperator, cl.HessianLinearOperator, cl.EFLinearOperator,
])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_padded_curvature_equals_truncated(op_cls, reduction):
    """With the last position of every example ignored, the padded loss is
    the SAME function of the parameters as the loss on data with that
    position dropped — so every autodiff curvature operator must agree."""
    model, params, X, y = _padded_problem()
    loss = CrossEntropyLoss(reduction)

    def model_trunc(p, x):
        h = jnp.tanh(x @ p["W"]) @ p["V"]
        return h[:, :-1].reshape(-1, 4)

    y_trunc = y.reshape(3, 4)[:, :-1].reshape(-1)
    pad = op_cls(model, loss, params, [(X, y)], check_deterministic=False)
    trunc = op_cls(
        model_trunc, loss, params, [(X, y_trunc)], check_deterministic=False
    )
    report_nonclose(
        np.asarray(pad.todense()),
        np.asarray(trunc.todense()),
        rtol=1e-4,
        atol=1e-6,
        name=f"{op_cls.__name__} padded vs truncated",
    )


def test_type2_columns_factorize_padded_hessian_sum():
    """Sum reduction: the TYPE2 sqrt columns must factorize the Hessian of
    the MASKED per-datum loss (zero at ignored positions)."""
    loss = CrossEntropyLoss("sum")
    out = jax.random.normal(jax.random.key(2), (3, 4))  # [C, D]
    target = jnp.asarray([0, -100, 2, -100])

    def datum_loss(flat):
        return loss(flat.reshape(out.shape)[None], target[None])

    H = np.asarray(jax.hessian(datum_loss)(out.reshape(-1)))
    cols = loss_hessian_sqrt_columns(loss, out, target).reshape(out.size, -1)
    report_nonclose(
        np.asarray(cols.T @ cols), H, rtol=1e-5, atol=1e-6,
        name="padded TYPE2 factorization",
    )
    # ignored positions contribute exactly zero
    assert float(jnp.abs(cols.reshape(-1, 3, 4)[:, :, 1]).max()) == 0.0


def test_mc_sampler_masks_padded_positions():
    loss = CrossEntropyLoss("sum")
    out = jax.random.normal(jax.random.key(3), (3, 4))
    target = jnp.asarray([1, -100, 0, 2])
    g = sample_grad_outputs(loss, out, target, jax.random.key(0), 64)
    assert float(jnp.abs(g[:, :, 1]).max()) == 0.0  # ignored position
    assert float(jnp.abs(g[:, :, 0]).max()) > 0.0


def test_out_of_range_targets_refused_eagerly():
    """-1 (not ignore_index) would silently wrap under jnp indexing; the
    determinism rails must refuse it like torch does."""
    model, params, X, y = _padded_problem()
    bad_y = np.asarray(y).copy()
    bad_y[0] = -1
    with pytest.raises(ValueError, match="targets outside"):
        cl.GGNLinearOperator(
            model, CrossEntropyLoss("mean"), params, [(X, jnp.asarray(bad_y))]
        )
    # ignore_index itself passes validation
    cl.GGNLinearOperator(model, CrossEntropyLoss("mean"), params, [(X, y)])


def test_padded_mc_fisher_expectation_is_padded_ggn():
    """With many MC samples, the sampled Fisher on a PADDED batch must
    approach the (autodiff, hence exactly masked) GGN — this pins the
    static->masked-loss mean rescale in the MC kernel."""
    model, params, X, y = _padded_problem()
    loss = CrossEntropyLoss("mean")
    G = cl.GGNLinearOperator(model, loss, params, [(X, y)],
                             check_deterministic=False)
    F = cl.GGNLinearOperator(model, loss, params, [(X, y)], mc_samples=3000,
                             check_deterministic=False)
    dG = np.asarray(G.todense())
    dF = np.asarray(F.todense())
    assert np.linalg.norm(dF - dG) / np.linalg.norm(dG) < 0.1


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_padded_kfac_ggt_equals_truncated(reduction):
    """EXPAND KFAC TYPE2 on a padded batch: the gradient covariance must
    EQUAL the truncated-data build's (ignored rows are zero and the mean
    rescale cancels the row-count mismatch exactly); the input covariance
    legitimately differs (it still sees the padded positions' activations)."""
    model, params, X, y = _padded_problem()
    loss = CrossEntropyLoss(reduction)

    def model_trunc(p, x):
        h = jnp.tanh(x @ p["W"]) @ p["V"]
        return h[:, :-1].reshape(-1, 4)

    y_trunc = y.reshape(3, 4)[:, :-1].reshape(-1)
    kw = dict(fisher_type="type-2", check_deterministic=False)
    pad = cl.KFACLinearOperator(model, loss, params, [(X, y)], **kw)
    trunc = cl.KFACLinearOperator(
        model_trunc, loss, params, [(X, y_trunc)], **kw
    )
    assert set(pad._ggT) == set(trunc._ggT)
    for gi in pad._ggT:
        np.testing.assert_allclose(
            np.asarray(pad._ggT[gi]), np.asarray(trunc._ggT[gi]),
            rtol=1e-5, atol=1e-7,
        )


def test_padded_ggn_diagonal_equals_dense_diagonal():
    """TYPE2 GGN diagonal on a padded batch equals the dense GGN's diagonal
    (which autodiff computes with the exactly-masked loss). Uses the
    unflattened ``[N, C, D]`` CE layout — the diagonal's per-datum vmap
    requires per-example outputs (same restriction as the reference)."""
    _, params, X, y_flat = _padded_problem()
    y = y_flat.reshape(3, 4)  # [N, D] targets, last position ignored

    def model(p, x):  # [B, T, 5] -> [B, C, T]
        h = jnp.tanh(x @ p["W"]) @ p["V"]
        return jnp.moveaxis(h, -1, 1)

    loss = CrossEntropyLoss("mean")
    G = cl.GGNLinearOperator(model, loss, params, [(X, y)],
                             check_deterministic=False)
    diag_op = cl.GGNDiagonalLinearOperator(
        model, loss, params, [(X, y)], check_deterministic=False
    )
    from curvlinops_tpu.utils.flatten import ravel_pytree

    flat_diag, _ = ravel_pytree(diag_op.diagonal)
    np.testing.assert_allclose(
        np.asarray(flat_diag), np.diag(np.asarray(G.todense())),
        rtol=1e-4, atol=1e-6,
    )


def test_kfac_builds_on_padded_batch():
    """KFAC TYPE2/MC on padded targets: finite factors, zero contribution
    from ignored rows (no NaNs from the -100 lookup)."""
    model, params, X, y = _padded_problem()
    for ft in ["type-2", "mc"]:
        kfac = cl.KFACLinearOperator(
            model, CrossEntropyLoss("sum"), params, [(X, y)],
            fisher_type=ft, mc_samples=2 if ft == "mc" else 1,
            check_deterministic=False,
        )
        v = np.random.default_rng(0).standard_normal(kfac.shape[0])
        assert np.isfinite(kfac @ v.astype(np.float32)).all()


def test_padded_kfac_empirical_ggt_equals_truncated():
    """EMPIRICAL fisher's /L and loss_correction also use STATIC counts,
    so the mean rescale applies to it too (it was 2/3 off before)."""
    model, params, X, y = _padded_problem()
    loss = CrossEntropyLoss("mean")

    def model_trunc(p, x):
        h = jnp.tanh(x @ p["W"]) @ p["V"]
        return h[:, :-1].reshape(-1, 4)

    y_trunc = y.reshape(3, 4)[:, :-1].reshape(-1)
    kw = dict(fisher_type="empirical", check_deterministic=False)
    pad = cl.KFACLinearOperator(model, loss, params, [(X, y)], **kw)
    trunc = cl.KFACLinearOperator(
        model_trunc, loss, params, [(X, y_trunc)], **kw
    )
    for gi in pad._ggT:
        np.testing.assert_allclose(
            np.asarray(pad._ggT[gi]), np.asarray(trunc._ggT[gi]),
            rtol=1e-5, atol=1e-7,
        )
