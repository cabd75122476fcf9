"""Tests for the device-prefetching data pipeline (`utils/prefetch.py`).

The torch reference hides host-side data prep behind ``DataLoader`` workers;
here the contract is: order-preserving, freshly re-iterable (so the
determinism rails in `risk.py` still work), exception-propagating, and
operator results are bit-identical with and without the wrapper.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu import GGNLinearOperator, PrefetchToDevice, prefetch_to_device
from curvlinops_tpu.losses import CrossEntropyLoss
from tests.cases import _mlp_params, mlp_fn


def _batches(n=4, batch=8, d_in=5, n_cls=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        X = rng.normal(size=(batch, d_in)).astype(np.float32)
        y = rng.integers(0, n_cls, size=(batch,))
        out.append((jnp.asarray(X), jnp.asarray(y)))
    return out


def test_order_preserved_and_reiterable():
    data = _batches()
    pf = PrefetchToDevice(data, size=2)
    for _ in range(2):  # two full passes, like the operators do
        got = list(pf)
        assert len(got) == len(data)
        for (gX, gy), (eX, ey) in zip(got, data):
            np.testing.assert_array_equal(np.asarray(gX), np.asarray(eX))
            np.testing.assert_array_equal(np.asarray(gy), np.asarray(ey))


def test_leaves_are_on_device():
    (X, y), *_ = list(PrefetchToDevice(_batches(n=1)))
    assert isinstance(X, jax.Array) and isinstance(y, jax.Array)


def test_numpy_batches_are_converted():
    data = [(np.ones((2, 3), np.float32), np.zeros((2,), np.int32))]
    (X, y), *_ = list(PrefetchToDevice(data))
    assert isinstance(X, jax.Array)
    np.testing.assert_array_equal(np.asarray(X), np.ones((2, 3)))


def test_sharding_applied():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))
    spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    data = [(np.ones((8, 3), np.float32), np.zeros((8,), np.int32))]
    (X, y), *_ = list(PrefetchToDevice(data, sharding=spec))
    assert X.sharding == spec
    assert y.sharding == spec


def test_exception_propagates():
    def bad_iter():
        yield (jnp.ones((2, 2)), jnp.zeros((2,), jnp.int32))
        raise RuntimeError("boom in the data pipeline")

    class BadIterable:
        def __iter__(self):
            return bad_iter()

    it = iter(PrefetchToDevice(BadIterable(), size=1))
    next(it)
    with pytest.raises(RuntimeError, match="boom in the data pipeline"):
        for _ in it:
            pass


def test_early_exit_stops_producer():
    produced = []

    def slow_iter():
        for i in range(100):
            produced.append(i)
            yield (jnp.full((2,), i), jnp.zeros((2,), jnp.int32))

    class Slow:
        def __iter__(self):
            return slow_iter()

    it = iter(PrefetchToDevice(Slow(), size=2))
    next(it)
    it.close()  # consumer abandons the iterator
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n, "producer kept running after consumer exit"
    assert n < 100


def test_bad_size_rejected():
    with pytest.raises(ValueError, match="size"):
        PrefetchToDevice([], size=0)


def test_operator_results_identical_with_prefetch():
    params = _mlp_params(jax.random.PRNGKey(0), [5, 7, 3])
    loss_fn = CrossEntropyLoss()
    data = _batches(n=3)
    G_plain = GGNLinearOperator(mlp_fn, loss_fn, params, data)
    G_pref = GGNLinearOperator(
        mlp_fn, loss_fn, params, prefetch_to_device(data, size=2)
    )
    v = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(1).normal(size=p.shape), p.dtype
        ),
        params,
    )
    out_plain = G_plain @ v
    out_pref = G_pref @ v
    for a, b in zip(jax.tree.leaves(out_plain), jax.tree.leaves(out_pref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
