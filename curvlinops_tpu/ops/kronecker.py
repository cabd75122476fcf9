"""Kronecker-product linear operator with closed-form properties and inverses.

Counterpart of the reference ``KroneckerProductLinearOperator``
(``curvlinops/kronecker.py:42-373``). The matvec reshapes the flat input into
the tensor grid of factor dimensions and contracts one factor per axis — k
MXU matmuls instead of materializing the Kronecker product. Inversion offers
the reference's three damping modes: per-factor damping, the Martens-Grosse
heuristic split (arXiv:1503.05671 §6.3), and exact damping via per-factor
eigendecompositions (``kronecker.py:250-326``). The damped Cholesky inverse
retries in float64 when the fp32 factorization produces NaNs
(``kronecker.py:328-373`` raises; XLA's cholesky returns NaN instead).

Example:
    >>> import jax, jax.numpy as jnp
    >>> from curvlinops_tpu import KroneckerProductLinearOperator
    >>> A = jax.random.normal(jax.random.key(0), (3, 3))
    >>> B = jax.random.normal(jax.random.key(1), (4, 4))
    >>> K = KroneckerProductLinearOperator(A, B)
    >>> v = jax.random.normal(jax.random.key(2), (12,))
    >>> bool(jnp.allclose(K @ v, jnp.kron(A, B) @ v, atol=1e-5))
    True
    >>> bool(jnp.allclose(K.trace(), jnp.trace(A) * jnp.trace(B), atol=1e-5))
    True
"""

from __future__ import annotations

import math
import warnings

import jax
import jax.numpy as jnp

from curvlinops_tpu.ops.base import LinearOperator
from curvlinops_tpu.ops.eigh import EighDecomposedLinearOperator


def kron_matmat(factors: list[jax.Array], M: jax.Array) -> jax.Array:
    """``(S_1 (x) ... (x) S_k) M`` for factors ``[m_i, n_i]``, ``M [prod n, K]``.

    K-leading operand order: every factor contracts the leading grid axis
    (always axis 1) and its output dimension cycles to the back, so the loop
    needs no per-factor relayout (the unbatched form of
    :func:`curvlinops_tpu.ops.stacked.stacked_kron_matmat`; A/B in
    ``benchmarks/micro_stacked_matvec.py``).
    """
    K = M.shape[-1]
    grid = tuple(S.shape[1] for S in factors)
    x = jnp.moveaxis(M.reshape(*grid, K), -1, 0)  # [K, g_1..g_k]
    for S in factors:
        # out[K, g_2.., m] = sum_g x[K, g, g_2..] S[m, g]
        x = jax.lax.dot_general(x, S, (((1,), (1,)), ((), ())))
    return jnp.moveaxis(x, 0, -1).reshape(-1, K)


def damped_cholesky_inverse(
    A: jax.Array, damping: float, retry_double_precision: bool = True
) -> jax.Array:
    """Invert ``A + damping I`` via Cholesky, with a float64 NaN-retry.

    Raises:
        RuntimeError: If the factorization fails even in double precision (or
            the retry is disabled).
    """
    n = A.shape[0]

    def _inv(mat):
        damped = mat + damping * jnp.eye(n, dtype=mat.dtype)
        L = jnp.linalg.cholesky(damped)
        eye = jnp.eye(n, dtype=mat.dtype)
        return jax.scipy.linalg.cho_solve((L, True), eye), L

    inv, L = _inv(A)
    if not bool(jnp.isnan(L).any()):
        return inv

    if not retry_double_precision or A.dtype == jnp.float64:
        raise RuntimeError(
            "Cholesky decomposition failed (NaNs in the factor) and double-"
            "precision retry is disabled."
        )
    warnings.warn(
        f"Cholesky failed in {A.dtype}; retrying in float64.", stacklevel=2
    )
    with jax.enable_x64(True):
        inv64, L64 = _inv(jnp.asarray(A, jnp.float64))
        if bool(jnp.isnan(L64).any()):
            raise RuntimeError("Cholesky decomposition failed in float64.")
        return jnp.asarray(inv64, A.dtype)


class KroneckerProductLinearOperator(LinearOperator):
    """Lazy ``S_1 (x) S_2 (x) ... (x) S_k`` over flat vectors."""

    def __init__(self, *factors: jax.Array):
        self._factors = [jnp.asarray(S) for S in factors]
        if not self._factors or any(S.ndim != 2 for S in self._factors):
            raise ValueError("Factors must be one or more matrices.")
        rows = math.prod(S.shape[0] for S in self._factors)
        cols = math.prod(S.shape[1] for S in self._factors)
        dtype = jnp.result_type(*[S.dtype for S in self._factors])
        super().__init__(
            jax.ShapeDtypeStruct((cols,), dtype), jax.ShapeDtypeStruct((rows,), dtype)
        )

    @property
    def factors(self) -> list[jax.Array]:
        """The Kronecker factors."""
        return self._factors

    def _matmat(self, M: jax.Array) -> jax.Array:
        return kron_matmat(self._factors, M)

    def _adjoint(self) -> "KroneckerProductLinearOperator":
        return KroneckerProductLinearOperator(
            *[S.conj().T for S in self._factors]
        )

    # ---------------- closed-form properties (kronecker.py:195-248) ------ #
    def _ensure_square(self):
        if any(S.shape[0] != S.shape[1] for S in self._factors):
            raise ValueError("Operation requires square Kronecker factors.")

    def trace(self) -> jax.Array:
        """``tr = prod_i tr(S_i)`` (square factors)."""
        self._ensure_square()
        out = jnp.trace(self._factors[0])
        for S in self._factors[1:]:
            out = out * jnp.trace(S)
        return out

    def det(self) -> jax.Array:
        """``det = prod_i det(S_i)^(N / n_i)`` (square factors)."""
        self._ensure_square()
        N = self.shape[0]
        out = None
        for S in self._factors:
            term = jnp.linalg.det(S) ** (N // S.shape[0])
            out = term if out is None else out * term
        return out

    def logdet(self) -> jax.Array:
        """``logdet = sum_i (N / n_i) logdet(S_i)`` (square factors).

        Per-factor ``logdet`` like the reference (``kronecker.py:226-238``,
        ``torch.logdet``): a factor with non-positive determinant yields NaN
        — never a plausible-looking ``log|det|``."""
        self._ensure_square()
        N = self.shape[0]
        out = None
        for S in self._factors:
            sign, ld = jnp.linalg.slogdet(S)
            term = (N // S.shape[0]) * jnp.where(sign > 0, ld, jnp.nan)
            out = term if out is None else out + term
        return out

    def frobenius_norm(self) -> jax.Array:
        """``||.||_F = prod_i ||S_i||_F``."""
        out = None
        for S in self._factors:
            term = jnp.linalg.norm(S)
            out = term if out is None else out * term
        return out

    # ---------------- inversion (kronecker.py:250-326) ------------------- #
    def inverse(
        self,
        damping: float = 0.0,
        use_heuristic_damping: bool = False,
        min_damping: float = 1e-8,
        use_exact_damping: bool = False,
        retry_double_precision: bool = True,
    ) -> LinearOperator:
        """Inverse with plain / Martens-Grosse heuristic / exact damping.

        Raises:
            ValueError: If both damping strategies are requested, or heuristic
                damping is requested for more than two factors.
            RuntimeError: If heuristic damping meets a negative mean eigenvalue.
        """
        self._ensure_square()
        if use_heuristic_damping and use_exact_damping:
            raise ValueError("Choose either heuristic or exact damping, not both.")

        if use_exact_damping:
            eig = [jnp.linalg.eigh(S) for S in self._factors]
            eigvals = eig[0][0]
            for vals, _ in eig[1:]:
                eigvals = jnp.kron(eigvals, vals)
            Q = KroneckerProductLinearOperator(*[vecs for _, vecs in eig])
            return EighDecomposedLinearOperator(eigvals, Q).inverse(damping=damping)

        if use_heuristic_damping and len(self._factors) > 2:
            raise ValueError(
                "Heuristic damping supports at most two factors, got "
                f"{len(self._factors)}."
            )
        if use_heuristic_damping and len(self._factors) == 2:
            S1, S2 = self._factors
            mean1 = float(jnp.mean(jnp.diag(S1)))
            mean2 = float(jnp.mean(jnp.diag(S2)))
            if mean1 < 0 or mean2 < 0:
                raise RuntimeError("Negative mean eigenvalue detected.")
            # Martens-Grosse pi-split (kronecker.py:307-316).  A zero factor
            # trace makes the scale ratio undefined (the reference's float
            # semantics produce an infinite pi and with it a zero block
            # inverse / failed Cholesky); a factor with no scale information
            # degenerates to the plain split.  Zero ggT factors are REAL on
            # saturated-softmax models: MC-sampled CE grad-outputs are
            # exactly p - onehot(argmax) = 0 in f32, and deeper blocks
            # underflow first (observed on the synthetic ResNet-50, whose
            # eval-mode BN at init matches torchvision's).
            pi = (
                math.sqrt(mean2 / mean1)
                if mean1 > 0 and mean2 > 0
                else 1.0
            )
            sqrt_damping = math.sqrt(damping)
            dampings = (
                max(sqrt_damping / pi, min_damping),
                max(sqrt_damping * pi, min_damping),
            )
        elif use_heuristic_damping:
            dampings = (max(damping, min_damping),)
        else:
            dampings = tuple(damping for _ in self._factors)

        return KroneckerProductLinearOperator(
            *[
                damped_cholesky_inverse(S, d, retry_double_precision)
                for S, d in zip(self._factors, dampings)
            ]
        )


class EmbeddingKroneckerOperator(LinearOperator):
    """``G (x) diag(d)`` — the KFAC block of an embedding layer.

    One-hot layer inputs make the input covariance EXACTLY diagonal (token
    counts), so the right Kronecker factor is a length-``V`` vector and the
    ``[V, V]`` matrix is never materialized (GPT-2's vocab would be 10 GiB).
    No reference counterpart (the reference refuses embeddings,
    ``curvlinops/kfac.py:117``); damping semantics mirror
    :class:`KroneckerProductLinearOperator` with the diagonal as the second
    factor.
    """

    def __init__(self, G: jax.Array, d: jax.Array):
        self._G = jnp.asarray(G)
        self._d = jnp.asarray(d)
        if self._G.ndim != 2 or self._d.ndim != 1:
            raise ValueError("Need a [C, C] matrix and a [V] diagonal vector.")
        V = self._d.shape[0]
        dtype = jnp.result_type(self._G.dtype, self._d.dtype)
        super().__init__(
            jax.ShapeDtypeStruct((self._G.shape[1] * V,), dtype),
            jax.ShapeDtypeStruct((self._G.shape[0] * V,), dtype),
        )
        self.SELF_ADJOINT = False

    @property
    def factors(self) -> list[jax.Array]:
        """``[G, d]`` — the dense left factor and the diagonal vector."""
        return [self._G, self._d]

    def _matmat(self, M: jax.Array) -> jax.Array:
        K = M.shape[-1]
        X = M.reshape(self._G.shape[1], self._d.shape[0], K)
        out = jnp.einsum("ab,bvk->avk", self._G, X) * self._d[None, :, None]
        return out.reshape(-1, K)

    def _adjoint(self) -> "EmbeddingKroneckerOperator":
        return EmbeddingKroneckerOperator(self._G.conj().T, self._d.conj())

    def _ensure_square(self):
        if self._G.shape[0] != self._G.shape[1]:
            raise ValueError("Operation requires a square left factor.")

    def trace(self) -> jax.Array:
        """``tr(G) * sum(d)``."""
        self._ensure_square()
        return jnp.trace(self._G) * jnp.sum(self._d)

    def det(self) -> jax.Array:
        """``det(G)^V * prod(d)^C``."""
        self._ensure_square()
        V, C = self._d.shape[0], self._G.shape[0]
        return jnp.linalg.det(self._G) ** V * jnp.prod(self._d) ** C

    def logdet(self) -> jax.Array:
        """``V logdet(G) + C sum(log d)``."""
        self._ensure_square()
        V, C = self._d.shape[0], self._G.shape[0]
        sign, ld = jnp.linalg.slogdet(self._G)
        ld = jnp.where(sign > 0, ld, jnp.nan)  # torch.logdet semantics
        return V * ld + C * jnp.sum(jnp.log(self._d))

    def frobenius_norm(self) -> jax.Array:
        """``||G||_F * ||d||_2``."""
        return jnp.linalg.norm(self._G) * jnp.linalg.norm(self._d)

    def inverse(
        self,
        damping: float = 0.0,
        use_heuristic_damping: bool = False,
        min_damping: float = 1e-8,
        use_exact_damping: bool = False,
        retry_double_precision: bool = True,
    ) -> LinearOperator:
        """Damped inverse with the three reference damping modes.

        Raises:
            ValueError: If both damping strategies are requested.
            RuntimeError: On a negative mean eigenvalue under heuristic
                damping.
        """
        self._ensure_square()
        if use_heuristic_damping and use_exact_damping:
            raise ValueError("Choose either heuristic or exact damping, not both.")
        if use_exact_damping:
            lam_G, Q_G = jnp.linalg.eigh(self._G)
            lam = lam_G[:, None] * self._d[None, :]
            return EmbeddingEighOperator(1.0 / (lam + damping), Q_G)
        if use_heuristic_damping:
            mean1 = float(jnp.mean(jnp.diag(self._G)))
            mean2 = float(jnp.mean(self._d))
            if mean1 < 0 or mean2 < 0:
                raise RuntimeError("Negative mean eigenvalue detected.")
            pi = math.sqrt(mean2 / mean1)
            sqrt_damping = math.sqrt(damping)
            d1 = max(sqrt_damping / pi, min_damping)
            d2 = max(sqrt_damping * pi, min_damping)
        else:
            d1 = d2 = damping
        return EmbeddingKroneckerOperator(
            damped_cholesky_inverse(self._G, d1, retry_double_precision),
            1.0 / (self._d + d2),
        )


class EmbeddingEighOperator(LinearOperator):
    """``(Q (x) I) diag(lam) (Q (x) I)^T`` — eigendecomposed embedding block.

    The diagonal right factor's eigenbasis is the identity, so only the
    ``[C, C]`` left eigenvectors are stored; eigenvalues are the full
    ``[C, V]`` grid ``lam_G (x) d``.
    """

    def __init__(self, eigenvalues: jax.Array, Q: jax.Array):
        self._lam = jnp.asarray(eigenvalues)  # [C, V]
        self._Q = jnp.asarray(Q)  # [C, C]
        if self._lam.ndim != 2 or self._Q.ndim != 2:
            raise ValueError("Need [C, V] eigenvalues and [C, C] eigenvectors.")
        size = self._lam.size
        super().__init__(
            jax.ShapeDtypeStruct((size,), self._lam.dtype),
            jax.ShapeDtypeStruct((size,), self._lam.dtype),
        )
        self.SELF_ADJOINT = True

    @property
    def eigenvalues(self) -> jax.Array:
        """The ``[C, V]`` eigenvalue grid."""
        return self._lam

    def _matmat(self, M: jax.Array) -> jax.Array:
        K = M.shape[-1]
        X = M.reshape(*self._lam.shape, K)
        W = jnp.einsum("ba,bvk->avk", self._Q, X)  # Q^T X
        W = W * self._lam[:, :, None]
        out = jnp.einsum("ab,bvk->avk", self._Q, W)
        return out.reshape(-1, K)

    def _adjoint(self) -> "EmbeddingEighOperator":
        return self

    def trace(self) -> jax.Array:
        """Sum of eigenvalues."""
        return jnp.sum(self._lam)

    def det(self) -> jax.Array:
        """Product of eigenvalues."""
        return jnp.prod(self._lam)

    def logdet(self) -> jax.Array:
        """Sum of log eigenvalues."""
        return jnp.sum(jnp.log(self._lam))

    def frobenius_norm(self) -> jax.Array:
        """L2 norm of the eigenvalues."""
        return jnp.linalg.norm(self._lam.reshape(-1))

    def inverse(self, damping: float = 0.0) -> "EmbeddingEighOperator":
        """``1/(lam + delta)`` in the same basis."""
        return EmbeddingEighOperator(1.0 / (self._lam + damping), self._Q)
