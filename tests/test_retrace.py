"""Compile-regression tests: the JAX analogue of ``test/test_compile.py``.

The reference asserts zero torch.compile graph breaks; here the invariants are
(1) repeated matvecs trigger NO retraces (jit cache hit per batch/column
shape), and (2) the per-batch kernels contain no host callbacks.
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
)

from tests.cases import make_case


@pytest.mark.parametrize(
    "op_cls", [HessianLinearOperator, GGNLinearOperator, EFLinearOperator]
)
def test_no_retrace_on_repeated_matvecs(op_cls):
    case = make_case("mlp_ce_mean")
    traces = {"n": 0}
    inner = case["model_fn"]

    def counting_model(p, x):
        traces["n"] += 1  # increments only while tracing (host side)
        return inner(p, x)

    op = op_cls(
        counting_model, case["loss_fn"], case["params"], case["data"],
        check_deterministic=False,
    )
    v = np.random.default_rng(0).standard_normal(op.shape[0]).astype(np.float32)

    _ = op @ v
    after_first = traces["n"]
    assert after_first > 0

    _ = op @ v
    assert traces["n"] == after_first, "second identical matvec must not retrace"

    # a new column count is a new shape: exactly one fresh trace set
    M = np.random.default_rng(1).standard_normal((op.shape[0], 3)).astype(np.float32)
    _ = op @ M
    after_matmat = traces["n"]
    assert after_matmat > after_first
    _ = op @ M
    assert traces["n"] == after_matmat, "repeated matmat must not retrace"


def test_kfac_matvec_no_retrace():
    case = make_case("mlp_ce_mean")
    kfac = KFACLinearOperator(
        case["model_fn"], case["loss_fn"], case["params"], case["data"],
        fisher_type="type-2", check_deterministic=False,
    )
    v = np.random.default_rng(2).standard_normal(kfac.shape[0]).astype(np.float32)
    _ = kfac @ v
    apply_fn = kfac._jit_apply
    assert apply_fn is not None
    sizes = apply_fn._cache_size()
    _ = kfac @ v
    _ = kfac @ v
    assert apply_fn._cache_size() == sizes


def test_batch_kernel_has_no_host_callbacks():
    """The jitted per-batch kernels must never call back to the host."""
    from curvlinops_tpu.curvature.ggn import make_batch_ggn_matmat

    case = make_case("mlp_ce_mean")
    X, y = case["data"][0]
    kernel = make_batch_ggn_matmat(case["model_fn"], case["loss_fn"])
    M = jax.tree.map(lambda p: jnp.zeros(p.shape + (1,)), case["params"])
    jaxpr = jax.make_jaxpr(kernel)(
        case["params"], X, y, M, jnp.float32(1.0), jax.random.key(0)
    )
    text = str(jaxpr)
    assert "callback" not in text, "host callback found in the GGN kernel"
