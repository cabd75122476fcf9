"""Library utils: doctests of worked examples, adapters, helpers."""

import doctest

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu.utils.misc import allclose_report, make_functional_call, split_list


@pytest.mark.parametrize(
    "module_name",
    [
        "curvlinops_tpu.curvature.hessian",
        "curvlinops_tpu.curvature.ggn",
        "curvlinops_tpu.kfac.operator",
        "curvlinops_tpu.ops.kronecker",
        "curvlinops_tpu.ops.inverse",
    ],
)
def test_doctests(module_name):
    """The library's worked examples must run (reference runs doctests in CI)."""
    import importlib

    mod = importlib.import_module(module_name)
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module_name}"


def test_allclose_report(capsys):
    assert allclose_report(np.ones(3), np.ones(3))
    assert not allclose_report(np.ones(3), np.asarray([1.0, 2.0, 1.0]))
    out = capsys.readouterr().out
    assert "mismatch at (1,)" in out


def test_split_list():
    assert split_list([1, 2, 3, 4, 5], [2, 3]) == [[1, 2], [3, 4, 5]]
    with pytest.raises(ValueError):
        split_list([1, 2], [3])


def test_make_functional_call_flax():
    flax = pytest.importorskip("flax")
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(nn.tanh(nn.Dense(5)(x)))

    net = Net()
    x = jnp.ones((4, 2))
    variables = net.init(jax.random.key(0), x)
    model_fn = make_functional_call(net)
    out = model_fn(variables["params"], x)
    assert out.shape == (4, 3)

    # the adapted flax model works with curvature operators AND the KFAC
    # collector discovers its Dense layers on the unmodified module
    from curvlinops_tpu import GGNLinearOperator, MSELoss
    from curvlinops_tpu.kfac.collector import TracedModel

    y = jnp.zeros((4, 3))
    G = GGNLinearOperator(
        model_fn, MSELoss("mean"), variables["params"], [(x, y)],
        check_deterministic=False,
    )
    v = np.random.default_rng(0).standard_normal(G.shape[0]).astype(np.float32)
    assert np.isfinite(G @ v).all()

    tm = TracedModel(model_fn, variables["params"], x)
    assert len(tm.layers) == 2
    assert all(u.bias_path is not None for u in tm.layers)


def test_make_functional_call_passthrough_and_error():
    fn = lambda p, x: x  # noqa: E731
    assert make_functional_call(fn) is fn
    with pytest.raises(ValueError):
        make_functional_call(42)


def test_unsupported_reduction_refused_at_construction():
    """A custom loss with reduction='batchmean' must fail with a clear
    message at construction, not a KeyError in the hot path."""
    import jax.numpy as jnp
    import pytest

    import curvlinops_tpu as cl

    class BatchMeanLoss:
        reduction = "batchmean"

        def __call__(self, pred, y):
            return jnp.mean(jnp.sum((pred - y) ** 2, -1))

    params = {"W": jnp.ones((2, 2))}
    data = [(jnp.ones((3, 2)), jnp.ones((3, 2)))]
    with pytest.raises(ValueError, match="'mean' or 'sum'"):
        cl.GGNLinearOperator(
            lambda p, x: x @ p["W"], BatchMeanLoss(), params, data
        )
