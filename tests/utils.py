"""Shared test utilities: dense ground truths and format-exhaustive checks.

Ground-truth builders live in ``curvlinops_tpu.examples`` (package parity with
the reference's ``curvlinops/examples``); this module re-exports them and adds
the format-exhaustive ``compare_matmat`` harness (``test/utils.py:603-675``
analogue).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from curvlinops_tpu.examples import (  # noqa: F401  (re-exports)
    dense_empirical_fisher,
    dense_ggn,
    dense_hessian,
    dense_jacobian,
    gradient_and_loss,
    total_loss_fn,
)

def report_nonclose(a, b, rtol=1e-5, atol=1e-7, name="arrays"):
    """Assert allclose with a diff report."""
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, f"{name}: shape mismatch {a.shape} vs {b.shape}"
    if not np.allclose(a, b, rtol=rtol, atol=atol):
        bad = ~np.isclose(a, b, rtol=rtol, atol=atol)
        idx = np.argwhere(bad)[:10]
        msg = "\n".join(f"  {tuple(i)}: {a[tuple(i)]} vs {b[tuple(i)]}" for i in idx)
        maxdiff = np.abs(a - b).max()
        raise AssertionError(
            f"{name}: {bad.sum()}/{bad.size} entries differ (max {maxdiff}):\n{msg}"
        )


def compare_matmat(
    op, dense: np.ndarray, rtol: float = 1e-5, atol: float = 1e-7, num_cols: int = 3
):
    """Check every supported format of ``op @ ...`` / ``... @ op`` vs a dense matrix.

    Mirrors the reference's exhaustive harness (``test/utils.py:603-675``).
    """
    rng = np.random.default_rng(0)
    out_dim, in_dim = dense.shape
    assert op.shape == (out_dim, in_dim)

    x = rng.standard_normal(in_dim).astype(np.float32)
    X = rng.standard_normal((in_dim, num_cols)).astype(np.float32)

    # flat jax vector / matrix
    report_nonclose(op @ jnp.asarray(x), dense @ x, rtol, atol, "flat vec")
    report_nonclose(op @ jnp.asarray(X), dense @ X, rtol, atol, "flat mat")

    # numpy vector / matrix (returns numpy)
    out_np = op @ x
    assert isinstance(out_np, np.ndarray), "numpy input must give numpy output"
    report_nonclose(out_np, dense @ x, rtol, atol, "np vec")
    report_nonclose(op @ X, dense @ X, rtol, atol, "np mat")

    # pytree vector / pytree with columns
    _, unravel = ravel_pytree(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), op.in_spec)
    )
    v_tree = unravel(jnp.asarray(x))
    out_tree = op @ v_tree
    out_flat = ravel_pytree(out_tree)[0]
    report_nonclose(out_flat, dense @ x, rtol, atol, "tree vec")

    M_tree = jax.vmap(unravel, in_axes=1, out_axes=-1)(jnp.asarray(X))
    out_cols = op @ M_tree
    out_cols_flat = jax.vmap(
        lambda t: ravel_pytree(t)[0], in_axes=-1, out_axes=1
    )(out_cols)
    report_nonclose(out_cols_flat, dense @ X, rtol, atol, "tree mat")

    # left multiplication
    Y = rng.standard_normal((num_cols, out_dim)).astype(np.float32)
    report_nonclose(Y @ op, Y @ dense, rtol, atol, "left mat")

    # adjoint
    y1 = rng.standard_normal(out_dim).astype(np.float32)
    report_nonclose(op.adjoint() @ y1, dense.T @ y1, rtol, atol, "adjoint vec")


def compare_consecutive_matmats(op, rtol=1e-5, atol=1e-8):
    """Two identical matmats must agree (``test/utils.py:678-709``)."""
    rng = np.random.default_rng(1)
    X = rng.standard_normal((op.shape[1], 2)).astype(np.float32)
    report_nonclose(op @ X, op @ X, rtol, atol, "consecutive matmats")
