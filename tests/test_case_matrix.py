"""Widened case matrix mirroring the reference's test axes.

- UNet-style conv model with VARYING spatial location counts per layer
  (``/root/reference/test/utils.py:483-526``): KFAC sum-vs-mean scaling
  consistency for MSE/CE/BCE across fisher types
  (``test/test_kfac.py:690-769``).
- Non-determinism refusal family (``test/cases.py:334-443``): dropout-like
  model randomness, batch-statistics + shuffled batches, random
  batch-dropping — each must raise at construction; the batch-stat model with
  fixed order must pass.
- Ragged drop-last-style batches (non-divisible sizes) for every dense-oracle
  operator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import curvlinops_tpu as cl
from curvlinops_tpu.kfac.operator import KFACLinearOperator
from curvlinops_tpu.losses import BCEWithLogitsLoss, CrossEntropyLoss, MSELoss

from tests.utils import dense_ggn, dense_hessian, dense_empirical_fisher


# --------------------------------------------------------------------- #
# UNet-style conv weight sharing
# --------------------------------------------------------------------- #
def _unet_params(key):
    k1, k2, k3 = jax.random.split(key, 3)

    def conv_p(k, kh, kw, cin, cout):
        return {
            "W": 0.4 * jax.random.normal(k, (kh, kw, cin, cout)),
            "b": 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (cout,)),
        }

    return {
        "c1": conv_p(k1, 3, 3, 3, 2),
        "c2": conv_p(k2, 3, 3, 2, 2),
        "c3": conv_p(k3, 3, 3, 2, 3),
    }


def _unet_fn(loss_kind):
    """Conv(stride 2) -> conv -> nearest-upsample x2 -> conv; the location
    count varies per layer (S^2/4 at the bottleneck, S^2 elsewhere)."""

    def conv(x, p, stride):
        out = jax.lax.conv_general_dilated(
            x, p["W"], (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + p["b"]

    def fn(params, X):
        h = conv(X, params["c1"], 2)
        h = conv(h, params["c2"], 1)
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = conv(h, params["c3"], 1)
        if loss_kind == "ce":
            return h.reshape(-1, h.shape[-1])  # [(B S S), C]
        return h  # [B, S, S, C] for MSE/BCE

    return fn


def _unet_data(loss_kind, key, S=6):
    """Two RAGGED batches (sizes 2 and 4) like the reference's #107 test."""
    ks = jax.random.split(key, 4)
    data = []
    for i, B in enumerate((2, 4)):
        X = jax.random.normal(ks[2 * i], (B, S, S, 3))
        if loss_kind == "mse":
            y = jax.random.normal(ks[2 * i + 1], (B, S, S, 3))
        elif loss_kind == "bce":
            y = jax.random.bernoulli(ks[2 * i + 1], 0.5, (B, S, S, 3)).astype(
                jnp.float32
            )
        else:
            y = jax.random.randint(ks[2 * i + 1], (B * S * S,), 0, 3)
        data.append((X, y))
    return data


LOSSES = {
    "mse": lambda red: MSELoss(red),
    "ce": lambda red: CrossEntropyLoss(red),
    "bce": lambda red: BCEWithLogitsLoss(red),
}


@pytest.mark.parametrize("fisher_type", ["type-2", "mc", "empirical"])
@pytest.mark.parametrize("loss_kind", ["mse", "ce", "bce"])
def test_unet_expand_sum_vs_mean_scaling(loss_kind, fisher_type):
    """KFAC(mean) equals KFAC(sum) with ggT rescaled by the loss-term count.

    The UNet's per-layer location counts differ (S^2 vs S^2/4), so any
    mis-scaling of the EXPAND convention shows up here
    (``test/test_kfac.py:690-769``).
    """
    S = 6
    key = jax.random.key(0)
    params = _unet_params(key)
    fn = _unet_fn(loss_kind)
    data = _unet_data(loss_kind, jax.random.fold_in(key, 1), S=S)

    common = dict(fisher_type=fisher_type, check_deterministic=False, seed=7)
    kfac_sum = KFACLinearOperator(
        fn, LOSSES[loss_kind]("sum"), params, data, **common
    )
    kfac_mean = KFACLinearOperator(
        fn, LOSSES[loss_kind]("mean"), params, data, **common
    )

    # simulate the mean reduction on the sum factors: the block is
    # ggT (x) aaT and only ggT carries the reduction, scaled by
    # 1/(num_data * loss_terms_per_example) (test_kfac.py:741-754)
    loss_term_factor = S * S
    if loss_kind in ("mse", "bce"):
        loss_term_factor *= 3  # MSE/BCE average over output channels too
    num_data = sum(X.shape[0] for X, _ in data)
    scale = 1.0 / (num_data * loss_term_factor)
    np.testing.assert_allclose(
        scale * np.asarray(kfac_sum.todense()),
        np.asarray(kfac_mean.todense()),
        rtol=5e-4,
        atol=1e-7,
        err_msg=f"unet {loss_kind} {fisher_type} sum-vs-mean scaling",
    )


def test_unet_reduce_builds_and_is_psd():
    """REDUCE-mode KFAC on the UNet (averaged-patch path) builds and is
    symmetric PSD (the averaged-vs-materialized equality is covered
    per-config in tests/test_averaged_patches.py)."""
    key = jax.random.key(3)
    params = _unet_params(key)
    fn = _unet_fn("mse")
    data = _unet_data("mse", jax.random.fold_in(key, 1))
    kfac = KFACLinearOperator(
        fn, MSELoss("mean"), params, data, kfac_approx="reduce",
        fisher_type="mc", mc_samples=2, check_deterministic=False,
    )
    dense = np.asarray(kfac.todense())
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)
    evals = np.linalg.eigvalsh(dense)
    assert evals.min() > -1e-6


# --------------------------------------------------------------------- #
# non-determinism refusal family
# --------------------------------------------------------------------- #
def _simple_data(key, N=12, D=6, C=3, batches=4):
    X = jax.random.normal(jax.random.fold_in(key, 0), (N, D))
    y = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, C)
    return list(zip(jnp.split(X, batches), jnp.split(y, batches)))


def _mlp(key, D=6, H=5, C=3):
    k1, k2 = jax.random.split(key)
    return {
        "w1": 0.5 * jax.random.normal(k1, (D, H)),
        "w2": 0.5 * jax.random.normal(k2, (H, C)),
    }


class _DropoutAugmentedData:
    """Applies a fresh Bernoulli input mask per pass (pipeline dropout).

    NOTE the jax-vs-torch semantics: host randomness INSIDE a jitted
    model_fn is baked in at trace time and therefore deterministic by
    construction — the torch Dropout non-determinism case
    (``test/cases.py:337-366``) can only arise here through the data
    pipeline or explicit PRNG keys, so that is where this case puts it.
    """

    def __init__(self, data):
        self._data = data
        self._rng = np.random.default_rng(0)

    def __iter__(self):
        out = []
        for X, y in self._data:
            mask = jnp.asarray(self._rng.random(X.shape) < 0.5, X.dtype)
            out.append((X * mask, y))
        return iter(out)


def test_dropout_like_pipeline_refused():
    """Per-pass dropout randomness in the input pipeline is caught."""
    params = _mlp(jax.random.key(0))

    def model_fn(p, X):
        return jax.nn.relu(X @ p["w1"]) @ p["w2"]

    with pytest.raises(RuntimeError, match="deterministic"):
        cl.GGNLinearOperator(
            model_fn, CrossEntropyLoss("mean"), params,
            _DropoutAugmentedData(_simple_data(jax.random.key(1))),
        )


class _ShuffledData:
    """Re-shuffles the examples into new batch compositions per pass
    (``DataLoader(shuffle=True)``)."""

    def __init__(self, data):
        self._X = jnp.concatenate([X for X, _ in data])
        self._y = jnp.concatenate([y for _, y in data])
        self._n_batches = len(data)
        self._rng = np.random.default_rng(0)

    def __iter__(self):
        order = self._rng.permutation(self._X.shape[0])
        Xs = jnp.split(self._X[order], self._n_batches)
        ys = jnp.split(self._y[order], self._n_batches)
        return iter(list(zip(Xs, ys)))


def _batchstat_model(p, X):
    """Batch-statistics normalization: the total loss depends on batch
    composition, so shuffled batch order is non-deterministic."""
    h = X @ p["w1"]
    h = (h - h.mean(axis=0)) / (h.std(axis=0) + 1e-5)
    return jax.nn.relu(h) @ p["w2"]


def test_batchstat_with_shuffled_batches_refused():
    params = _mlp(jax.random.key(2))
    data = _ShuffledData(_simple_data(jax.random.key(3)))
    with pytest.raises(RuntimeError, match="deterministic"):
        cl.GGNLinearOperator(params=params, model_fn=_batchstat_model,
                             loss_fn=CrossEntropyLoss("mean"), data=data)


def test_batchstat_with_fixed_order_passes():
    """The positive control: batch statistics are fine with a fixed order."""
    params = _mlp(jax.random.key(2))
    data = _simple_data(jax.random.key(3))
    op = cl.GGNLinearOperator(
        _batchstat_model, CrossEntropyLoss("mean"), params, data
    )
    v = np.random.default_rng(0).normal(size=op.shape[1]).astype(np.float32)
    assert np.isfinite(op @ v).all()


class _RandomDropData:
    """Drops a different batch each pass (drop_last + shuffle analogue)."""

    def __init__(self, data):
        self._data = data
        self._count = 0

    def __iter__(self):
        drop = self._count % len(self._data)
        self._count += 1
        return iter([b for i, b in enumerate(self._data) if i != drop])


def test_random_batch_drop_refused():
    params = _mlp(jax.random.key(4))
    data = _RandomDropData(_simple_data(jax.random.key(5)))
    with pytest.raises(RuntimeError, match="deterministic"):
        cl.HessianLinearOperator(
            _batchstat_model.__wrapped__
            if hasattr(_batchstat_model, "__wrapped__")
            else (lambda p, X: jax.nn.relu(X @ p["w1"]) @ p["w2"]),
            CrossEntropyLoss("mean"),
            params,
            data,
        )


# --------------------------------------------------------------------- #
# ragged (drop_last-style, non-divisible) batches for every operator
# --------------------------------------------------------------------- #
def _ragged_case(key, N=11, D=5, C=3, sizes=(4, 4, 3)):
    assert sum(sizes) == N
    params = _mlp(key, D=D, C=C)
    X = jax.random.normal(jax.random.fold_in(key, 10), (N, D))
    y = jax.random.randint(jax.random.fold_in(key, 11), (N,), 0, C)
    data, start = [], 0
    for s in sizes:
        data.append((X[start : start + s], y[start : start + s]))
        start += s

    def model_fn(p, X):
        return jax.nn.relu(X @ p["w1"]) @ p["w2"]

    return model_fn, CrossEntropyLoss("mean"), params, data


@pytest.mark.parametrize(
    "op_cls,oracle",
    [
        (cl.HessianLinearOperator, dense_hessian),
        (cl.GGNLinearOperator, dense_ggn),
        (cl.EFLinearOperator, dense_empirical_fisher),
    ],
    ids=["hessian", "ggn", "ef"],
)
def test_ragged_batches_match_dense_oracle(op_cls, oracle):
    model_fn, loss_fn, params, data = _ragged_case(jax.random.key(6))
    op = op_cls(model_fn, loss_fn, params, data)
    dense = oracle(model_fn, loss_fn, params, data)
    got = op @ np.eye(op.shape[0], dtype=np.float32)
    np.testing.assert_allclose(got, dense, rtol=5e-4, atol=1e-5)


def test_ragged_batches_ggn_diagonal():
    from jax.flatten_util import ravel_pytree

    model_fn, loss_fn, params, data = _ragged_case(jax.random.key(7))
    diag_op = cl.GGNDiagonalLinearOperator(model_fn, loss_fn, params, data)
    dense = dense_ggn(model_fn, loss_fn, params, data)
    np.testing.assert_allclose(
        np.asarray(ravel_pytree(diag_op.diagonal)[0]), np.diag(dense),
        rtol=5e-4, atol=1e-5,
    )


# --------------------------------------------------------------------- #
# shard_params placement report
# --------------------------------------------------------------------- #
def test_shard_params_report():
    from curvlinops_tpu.parallel.mesh import make_mesh, shard_params

    mesh = make_mesh(4, ("model",), (4,))
    params = {
        "big": jnp.zeros((8, 1024)),
        "embed": jnp.zeros((1024, 50)),  # only the LEADING dim is eligible
        "square": jnp.zeros((64, 64)),  # tie -> trailing dim wins
        "indivisible": jnp.zeros((9, 1023)),
        "small": jnp.zeros((8, 8)),
        "vec": jnp.zeros((1024,)),
    }
    report: dict = {}
    shard_params(params, mesh, min_size=16, report=report)
    sharded = {name: dim for name, _, dim in report["sharded"]}
    replicated = {name: reason for name, _, reason in report["replicated"]}
    assert sharded == {"['big']": 1, "['embed']": 0, "['square']": 1}
    assert "no dim divisible" in replicated["['indivisible']"]
    assert "min_size" in replicated["['small']"]
    assert "fewer than 2 dims" in replicated["['vec']"]
