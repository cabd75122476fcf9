"""Inverse linear operators: CG, LSMR, and truncated Neumann series.

Counterparts of the reference's ``CGInverseLinearOperator`` /
``LSMRInverseLinearOperator`` / ``NeumannInverseLinearOperator``
(``curvlinops/inverse.py:54-391``) — but where the reference escapes to
GPyTorch / host SciPy, the iterations here run entirely on device
(:mod:`curvlinops_tpu.solvers.cg`, :mod:`curvlinops_tpu.solvers.lsmr`).
Because an operator's ``_matmat`` composes jitted per-batch kernels, it is
itself traceable: the whole Krylov solve — including every data batch of a
curvature operator — compiles into ONE XLA program with zero host syncs.

Example:
    >>> import jax, jax.numpy as jnp
    >>> from curvlinops_tpu import (CGInverseLinearOperator,
    ...     NeumannInverseLinearOperator, MatrixLinearOperator)
    >>> M = jax.random.normal(jax.random.key(0), (6, 6)) / 6
    >>> A = MatrixLinearOperator(M @ M.T + jnp.eye(6))  # SPD
    >>> v = jax.random.normal(jax.random.key(1), (6,))
    >>> x = CGInverseLinearOperator(A, maxiter=50, tol=1e-9) @ v
    >>> bool(jnp.allclose(A @ x, v, atol=1e-4))
    True
    >>> x = NeumannInverseLinearOperator(A, num_terms=400, scale=0.4) @ v
    >>> bool(jnp.allclose(A @ x, v, atol=1e-3))
    True
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import LinearOperator
from curvlinops_tpu.solvers.cg import batched_cg
from curvlinops_tpu.solvers.lsmr import batched_lsmr
from curvlinops_tpu.utils.flatten import tree_add, tree_scale


@jax.jit
def _neumann_step(term: Any, PAt: Any, result: Any, scale: jax.Array):
    """One fused Neumann-series update: new term, running sum, NaN flag."""
    new_term = jax.tree.map(lambda t, pat: t - scale * pat, term, PAt)
    flag = jnp.any(
        jnp.stack([jnp.isnan(l).any() for l in jax.tree.leaves(new_term)])
    )
    return new_term, tree_add(result, new_term), flag


@jax.jit
def _neumann_step_unchecked(term: Any, PAt: Any, result: Any, scale: jax.Array):
    """The fused update without the NaN reduction (``check_nan=False``)."""
    new_term = jax.tree.map(lambda t, pat: t - scale * pat, term, PAt)
    return new_term, tree_add(result, new_term)


class CGInverseLinearOperator(LinearOperator):
    """``A^{-1}`` via on-device batched conjugate gradients."""

    def __init__(
        self,
        A: LinearOperator,
        *,
        maxiter: int = 100,
        tol: float = 1e-5,
        atol: float = 1e-8,
        preconditioner: LinearOperator | None = None,
    ):
        if A.shape[0] != A.shape[1]:
            raise ValueError(f"Operator must be square, got {A.shape}.")
        super().__init__(A.in_spec, A.out_spec)
        self._A = A
        self._maxiter, self._tol, self._atol = maxiter, tol, atol
        self._preconditioner = preconditioner
        self._last_info: dict | None = None
        self.SELF_ADJOINT = A.SELF_ADJOINT

    @property
    def last_info(self) -> dict | None:
        """Per-column iteration counts / residuals of the last solve."""
        return self._last_info

    def set_cg_hyperparameters(self, **kwargs) -> None:
        """Update solver hyperparameters (maxiter/tol/atol)."""
        for name in ("maxiter", "tol", "atol"):
            if name in kwargs:
                setattr(self, f"_{name}", kwargs.pop(name))
        if kwargs:
            raise ValueError(f"Unknown CG hyperparameters: {sorted(kwargs)}.")

    def _matmat(self, M: Any) -> Any:
        precond = (
            self._preconditioner._matmat if self._preconditioner is not None else None
        )
        X, info = batched_cg(
            self._A._matmat,
            M,
            maxiter=self._maxiter,
            tol=self._tol,
            atol=self._atol,
            preconditioner=precond,
        )
        self._last_info = info
        return X

    def _adjoint(self) -> "CGInverseLinearOperator":
        return CGInverseLinearOperator(
            self._A.adjoint(),
            maxiter=self._maxiter,
            tol=self._tol,
            atol=self._atol,
            preconditioner=self._preconditioner,
        )


class LSMRInverseLinearOperator(LinearOperator):
    """Least-squares (pseudo-)inverse via on-device batched LSMR."""

    def __init__(
        self,
        A: LinearOperator,
        *,
        damp: float = 0.0,
        maxiter: int = 100,
        atol: float = 1e-6,
        btol: float = 1e-6,
    ):
        # maps output space back to input space
        super().__init__(A.out_spec, A.in_spec)
        self._A = A
        self._damp, self._maxiter, self._atol, self._btol = damp, maxiter, atol, btol
        self._lsmr_info: dict | None = None

    @property
    def lsmr_info(self) -> dict | None:
        """Iteration/normr/normar info of the most recent solve."""
        return self._lsmr_info

    def set_lsmr_hyperparameters(self, **kwargs) -> None:
        """Update solver hyperparameters (damp/maxiter/atol/btol)."""
        for name in ("damp", "maxiter", "atol", "btol"):
            if name in kwargs:
                setattr(self, f"_{name}", kwargs.pop(name))
        if kwargs:
            raise ValueError(f"Unknown LSMR hyperparameters: {sorted(kwargs)}.")

    def _matmat(self, M: Any) -> Any:
        adj = self._A.adjoint()
        X, info = batched_lsmr(
            self._A._matmat,
            adj._matmat,
            M,
            damp=self._damp,
            maxiter=self._maxiter,
            atol=self._atol,
            btol=self._btol,
        )
        self._lsmr_info = info
        return X


class NeumannInverseLinearOperator(LinearOperator):
    r"""Truncated, rescaled Neumann-series inverse (``inverse.py:214-391``).

    ``A^{-1} ~= scale * sum_{k<=K} (I - scale * A)^k`` — with an optional left
    preconditioner ``P`` (Wang et al., NeurIPS 2025):
    ``A^{-1} ~= scale * sum_{k<=K} (I - scale P A)^k P``.

    Diverging series produce NaNs; each term is checked and a ``ValueError``
    raised, mirroring the reference's NaN guard (``inverse.py:356-361``).
    """

    def __init__(
        self,
        A: LinearOperator,
        *,
        num_terms: int = 100,
        scale: float = 1.0,
        check_nan: bool = True,
        preconditioner: LinearOperator | None = None,
    ):
        if A.shape[0] != A.shape[1]:
            raise ValueError(f"Operator must be square, got {A.shape}.")
        super().__init__(A.in_spec, A.out_spec)
        self._A = A
        self._num_terms = num_terms
        self._scale = scale
        self._check_nan = check_nan
        self._preconditioner = preconditioner
        self.SELF_ADJOINT = A.SELF_ADJOINT and preconditioner is None

    def set_neumann_hyperparameters(
        self, num_terms: int | None = None, scale: float | None = None
    ) -> None:
        """Update truncation length and rescaling."""
        if num_terms is not None:
            self._num_terms = num_terms
        if scale is not None:
            self._scale = scale

    def _matmat(self, M: Any) -> Any:
        P = self._preconditioner

        def apply_P(V: Any) -> Any:
            return P._matmat(V) if P is not None else V

        term = apply_P(M)  # k = 0 term: P M
        result = term
        nan_flags = []  # per-term device booleans; ONE readback after the loop
        scale = jnp.asarray(self._scale)
        for _ in range(1, self._num_terms + 1):
            # term <- (I - scale * P A) term; the update (+ NaN flag when
            # checking) runs as ONE jitted dispatch, and the flag stays ON
            # DEVICE — a host readback (or ~190 tiny eager ops) per term
            # would serialize the async dispatch chain (on a remote-TPU
            # runtime that measured 178 s for 100 terms on ResNet-18;
            # fused: 10.4 s, the remainder being the operator's own
            # per-term dispatches)
            PAt = apply_P(self._A._matmat(term))
            if self._check_nan:
                term, result, flag = _neumann_step(term, PAt, result, scale)
                nan_flags.append(flag)
            else:
                term, result = _neumann_step_unchecked(term, PAt, result, scale)
        if nan_flags:
            first_bad = int(jnp.argmax(jnp.stack(nan_flags)))
            if bool(nan_flags[first_bad]):
                raise ValueError(
                    f"Neumann series diverged (NaN at term {first_bad + 1}); "
                    "decrease `scale` or the spectral radius of I - scale*A."
                )
        return tree_scale(self._scale, result)

    def _adjoint(self) -> LinearOperator:
        if self._preconditioner is None:
            return NeumannInverseLinearOperator(
                self._A.adjoint(),
                num_terms=self._num_terms,
                scale=self._scale,
                check_nan=self._check_nan,
            )
        return NeumannInverseLinearOperator(
            self._A.adjoint(),
            num_terms=self._num_terms,
            scale=self._scale,
            check_nan=self._check_nan,
            preconditioner=self._preconditioner.adjoint(),
        )
