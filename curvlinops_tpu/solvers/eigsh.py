"""On-device top-k eigenpairs and singular values via LOBPCG / Lanczos.

TPU-native replacement for the reference's host escape to SciPy's ARPACK
``eigsh``/``svds`` (``_torch_base.py:560-592`` + call sites in
``papyan2020traces/spectrum.py`` and ``computers/kfoc_make_fx.py``): eigenpair
workloads never leave the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.sparse.linalg import lobpcg_standard


def topk_eigenpairs(
    A, k: int, *, maxiter: int = 100, tol: float | None = None,
    key: jax.Array | None = None, jit: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Largest-``k`` eigenpairs of a symmetric PSD operator via LOBPCG.

    Args:
        A: Symmetric operator on flat vectors (supports ``A @ X`` matmats).
        k: Number of eigenpairs.
        maxiter: LOBPCG iteration cap.
        tol: Residual tolerance (library default when ``None``).
        key: PRNG key for the start block.
        jit: Compile the WHOLE LOBPCG loop (including every operator matmat)
            into one XLA program, removing per-iteration dispatch and
            convergence-check host syncs (measured ~10% on a ResNet-18 GGN,
            k=5 — most of LOBPCG's cost is genuine matmat compute on the
            3k-column search block). Off by default: the operator's
            data/params are baked into the compiled program as closure
            constants (no ``FrozenModelFn`` plumbing through a generic
            operator), which remote-compile services may reject for large
            models, and the wrapper recompiles on every call.

    Returns:
        ``(eigenvalues [k] descending, eigenvectors [dim, k])``.
    """
    dim = A.shape[0]
    key = key if key is not None else jax.random.key(0)
    X0 = jax.random.normal(key, (dim, k), A.dtype)

    def matmat(X):
        return A @ X

    def solve(X0):
        evals, evecs, _ = lobpcg_standard(matmat, X0, m=maxiter, tol=tol)
        order = jnp.argsort(evals)[::-1]
        return evals[order], evecs[:, order]

    return jax.jit(solve)(X0) if jit else solve(X0)


def smallest_eigenvalue(
    A, *, num_iters: int = 64, key: jax.Array | None = None
) -> jax.Array:
    """Smallest eigenvalue estimate via reorthogonalized Lanczos."""
    from curvlinops_tpu.solvers.lanczos import lanczos_extreme_eigenvalues

    lo, _ = lanczos_extreme_eigenvalues(A, num_iters=num_iters, key=key)
    return lo
