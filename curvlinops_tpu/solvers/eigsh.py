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
    key: jax.Array | None = None, jit: bool | str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Largest-``k`` eigenpairs of a symmetric PSD operator via LOBPCG.

    Args:
        A: Symmetric operator on flat vectors (supports ``A @ X`` matmats).
        k: Number of eigenpairs.
        maxiter: LOBPCG iteration cap.
        tol: Residual tolerance (library default when ``None``).
        key: PRNG key for the start block.
        jit: Compile the WHOLE LOBPCG loop (including every operator matmat)
            into one cached XLA program, removing per-iteration dispatch,
            per-call loop re-tracing, and convergence-check host syncs.
            ``"auto"`` (default) fuses whenever ``A`` is a
            :class:`~curvlinops_tpu.ops.base.LinearOperator` — its state is
            threaded through as jit ARGUMENTS via ``A.traced()`` (LOBPCG
            applies the operator at column widths ``{1, k, 3k}``, so three
            traced forms feed one program), never as embedded HLO constants.
            ``False`` forces the eager loop.

    Returns:
        ``(eigenvalues [k] descending, eigenvectors [dim, k])``.
    """
    from curvlinops_tpu.ops.base import LinearOperator

    dim = A.shape[0]
    key = key if key is not None else jax.random.key(0)
    X0 = jax.random.normal(key, (dim, k), A.dtype)

    fuse = jit if isinstance(jit, bool) else isinstance(A, LinearOperator)
    if fuse and isinstance(A, LinearOperator):
        widths = sorted({1, k, 3 * k})
        forms = {w: A.traced_flat(w) for w in widths}
        from curvlinops_tpu.ops.base import cached_program

        def build():
            def fused(X0, consts_by_width):
                def matmat(X):
                    fn, _ = forms[X.shape[1]]
                    return fn(X, *consts_by_width[X.shape[1]])

                evals, evecs, _ = lobpcg_standard(matmat, X0, m=maxiter, tol=tol)
                order = jnp.argsort(evals)[::-1]
                return evals[order], evecs[:, order]

            return jax.jit(fused)

        program = cached_program(A, ("lobpcg", k, maxiter, tol), build)
        return program(X0, {w: forms[w][1] for w in widths})

    def matmat(X):
        return A @ X

    def solve(X0):
        evals, evecs, _ = lobpcg_standard(matmat, X0, m=maxiter, tol=tol)
        order = jnp.argsort(evals)[::-1]
        return evals[order], evecs[:, order]

    return jax.jit(solve)(X0) if fuse else solve(X0)


def smallest_eigenvalue(
    A, *, num_iters: int = 64, key: jax.Array | None = None
) -> jax.Array:
    """Smallest eigenvalue estimate via reorthogonalized Lanczos."""
    from curvlinops_tpu.solvers.lanczos import lanczos_extreme_eigenvalues

    lo, _ = lanczos_extreme_eigenvalues(A, num_iters=num_iters, key=key)
    return lo
