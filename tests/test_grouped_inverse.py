"""The one-program grouped Cholesky build must match the per-block path.

``chain.py::grouped_kron_inverse`` inverts every plain/heuristic-damped
Kronecker factor in ONE jitted program with a single two-flag readback
(the per-block path pays 2-4 host round trips per block — measured 7.8 s
of pure tunnel latency on the 124M GPT). These tests pin (a) numerical
equality with the per-block reference path, (b) the NaN -> ``None``
fallback contract, (c) the heuristic refusals, and (d) operator-level
equivalence of the fallback path itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curvlinops_tpu.kfac.chain import grouped_kron_inverse, stacked_kron_inverse
from curvlinops_tpu.ops.kronecker import damped_cholesky_inverse

from tests.utils import report_nonclose


def _spd(key, n, L=None):
    shape = (n, n) if L is None else (L, n, n)
    A = jax.random.normal(key, shape)
    return jnp.einsum("...ij,...kj->...ik", A, A) / n + 0.1 * jnp.eye(n)


def _blocks(seed=0):
    k = jax.random.split(jax.random.key(seed), 6)
    return {
        0: ("kron", [_spd(k[0], 3), _spd(k[1], 4)]),
        1: ("kron", [_spd(k[2], 5)]),
        2: ("skron", [_spd(k[3], 3, L=2), _spd(k[4], 2, L=2)]),
        3: ("kron", [_spd(k[5], 4), _spd(k[0], 4)]),  # shape-batches with 0
    }


@pytest.mark.parametrize("heuristic", [False, True], ids=["plain", "heuristic"])
def test_grouped_matches_per_block(heuristic):
    blocks = _blocks()
    out = grouped_kron_inverse(blocks, 1e-2, heuristic, 1e-8)
    assert out is not None
    for gi, (kind, factors) in blocks.items():
        if kind == "skron":
            expected = stacked_kron_inverse(
                factors, 1e-2, heuristic, 1e-8, True
            )
        else:
            import math

            if heuristic and len(factors) == 2:
                S1, S2 = factors
                m1 = float(jnp.mean(jnp.diag(S1)))
                m2 = float(jnp.mean(jnp.diag(S2)))
                pi = math.sqrt(m2 / m1)
                ds = (
                    max(math.sqrt(1e-2) / pi, 1e-8),
                    max(math.sqrt(1e-2) * pi, 1e-8),
                )
            elif heuristic:
                ds = (max(1e-2, 1e-8),) * len(factors)
            else:
                ds = (1e-2,) * len(factors)
            expected = [
                damped_cholesky_inverse(S, d) for S, d in zip(factors, ds)
            ]
        for fi, (got, exp) in enumerate(zip(out[gi], expected)):
            report_nonclose(
                got, exp, rtol=1e-4, atol=1e-6,
                name=f"block {gi} factor {fi}",
            )


def test_grouped_nan_returns_none():
    blocks = _blocks()
    bad = jnp.full((4, 4), jnp.nan)
    blocks[4] = ("kron", [bad])
    assert grouped_kron_inverse(blocks, 1e-2, False, 1e-8) is None


@pytest.mark.parametrize("zero_slot", [0, 1, "both"])
def test_heuristic_zero_trace_factor_degenerates_to_plain_split(zero_slot):
    """A zero factor trace has no scale information: pi degenerates to 1.

    REAL case, not synthetic paranoia: MC-sampled CE grad-outputs are
    exactly ``p - onehot(argmax) = 0`` under a saturated softmax, and the
    deep half of the synthetic ResNet-50's ggT factors underflow to exact
    zero (its eval-mode BN at init matches torchvision's).  The reference's
    float semantics (kronecker.py:309-316) give ``pi = inf`` and with it a
    zero/failed block inverse; both our paths must instead fall back to the
    plain ``sqrt(damping)`` split and agree with each other.
    """
    from curvlinops_tpu.ops.kronecker import KroneckerProductLinearOperator

    k = jax.random.split(jax.random.key(7), 2)
    S1 = jnp.zeros((3, 3)) if zero_slot in (0, "both") else _spd(k[0], 3)
    S2 = jnp.zeros((4, 4)) if zero_slot in (1, "both") else _spd(k[1], 4)
    damping = 1e-2

    # grouped one-program path
    out = grouped_kron_inverse({0: ("kron", [S1, S2])}, damping, True, 1e-8)
    assert out is not None
    # per-block path (the fp64-retry fallback)
    inv_op = KroneckerProductLinearOperator(S1, S2).inverse(
        damping=damping, use_heuristic_damping=True
    )
    sqrt_d = float(jnp.sqrt(jnp.asarray(damping)))
    for fi, (S, got, got_block) in enumerate(
        zip([S1, S2], out[0], inv_op.factors)
    ):
        assert np.isfinite(np.asarray(got)).all(), f"factor {fi} not finite"
        expected = damped_cholesky_inverse(S, max(sqrt_d, 1e-8))
        report_nonclose(
            got, expected, rtol=1e-4, atol=1e-6,
            name=f"grouped factor {fi} (zero_slot={zero_slot})",
        )
        report_nonclose(
            got_block, expected, rtol=1e-4, atol=1e-6,
            name=f"per-block factor {fi} (zero_slot={zero_slot})",
        )


def test_grouped_negative_mean_raises():
    blocks = {0: ("kron", [-jnp.eye(3), jnp.eye(4)])}
    with pytest.raises(RuntimeError, match="Negative mean eigenvalue"):
        grouped_kron_inverse(blocks, 1e-2, True, 1e-8)


def test_grouped_heuristic_three_factors_raises():
    k = jax.random.key(0)
    blocks = {0: ("kron", [_spd(k, 2), _spd(k, 2), _spd(k, 2)])}
    with pytest.raises(ValueError, match="at most two factors"):
        grouped_kron_inverse(blocks, 1e-2, True, 1e-8)


@pytest.mark.parametrize("heuristic", [False, True], ids=["plain", "heuristic"])
def test_operator_fallback_matches_grouped(heuristic, monkeypatch):
    """Forcing the NaN fallback must reproduce the grouped result exactly
    (the fallback is the per-block fp64-retry path in ``operator.py``)."""
    from curvlinops_tpu import MSELoss
    from curvlinops_tpu.kfac.operator import KFACLinearOperator

    key = jax.random.key(1)
    params = {
        "l0": {"W": 0.4 * jax.random.normal(key, (4, 3)),
               "b": jnp.zeros(3)},
        "l1": {"W": 0.4 * jax.random.normal(jax.random.key(2), (3, 2))},
    }

    def model_fn(p, x):
        return jnp.tanh(x @ p["l0"]["W"] + p["l0"]["b"]) @ p["l1"]["W"]

    X = jax.random.normal(jax.random.key(3), (8, 4))
    y = jax.random.normal(jax.random.key(4), (8, 2))
    op = KFACLinearOperator(
        model_fn, MSELoss("mean"), params, [(X, y)],
        check_deterministic=False,
    )
    kwargs = dict(damping=1e-2, use_heuristic_damping=heuristic)
    dense_grouped = np.asarray(op.inverse(**kwargs).todense())

    import curvlinops_tpu.kfac.operator as op_mod

    monkeypatch.setattr(
        op_mod, "grouped_kron_inverse", lambda *a, **k: None
    )
    dense_fallback = np.asarray(op.inverse(**kwargs).todense())
    report_nonclose(
        dense_grouped, dense_fallback, rtol=1e-5, atol=1e-7,
        name="grouped vs fallback",
    )
