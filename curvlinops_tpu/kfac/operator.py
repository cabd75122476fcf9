"""KFAC linear operator: ``P @ K @ P^T`` over parameter pytrees.

Counterpart of the reference ``KFACLinearOperator`` (``curvlinops/kfac.py:43-350``)
and its canonical converters (``kfac_utils.py:183-398``): the Kronecker-factored
curvature lives in a canonical per-group space (flattened ``[d_out, d_in(+1)]``
blocks); ``ToCanonical``/``FromCanonical`` are pure transpose/reshape/concat
maps between the parameter pytree and that space — their adjoints come for
free from ``jax.linear_transpose`` since they are orthonormal permutations.

Matvecs after the one-time factor build touch no data: the whole chain
(canonical converters + every Kronecker block) runs as ONE jitted
factor-as-arguments program (``kfac/chain.py``).

Example:
    >>> import jax, jax.numpy as jnp
    >>> from curvlinops_tpu import GGNLinearOperator, KFACLinearOperator
    >>> from curvlinops_tpu.losses import MSELoss
    >>> # single dense layer, ONE datum, type-2: KFAC is EXACTLY the GGN
    >>> params = {"W": jax.random.normal(jax.random.key(0), (4, 3))}
    >>> model_fn = lambda p, x: x @ p["W"]
    >>> data = [(jax.random.uniform(jax.random.key(1), (1, 4)),
    ...          jax.random.uniform(jax.random.key(2), (1, 3)))]
    >>> kfac = KFACLinearOperator(model_fn, MSELoss("sum"), params, data,
    ...                           fisher_type="type-2")
    >>> ggn = GGNLinearOperator(model_fn, MSELoss("sum"), params, data)
    >>> bool(jnp.allclose(kfac.todense(), ggn.todense(), atol=1e-5))
    True
    >>> # damped inverse: (KFAC + delta I)^{-1} (KFAC + delta I) v == v
    >>> v = jax.random.normal(jax.random.key(3), (12,))
    >>> inv = kfac.inverse(damping=1e-1, use_exact_damping=True)
    >>> w = kfac @ v + 1e-1 * v
    >>> bool(jnp.allclose(inv @ w, v, atol=1e-4))
    True
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.curvature.loss_hessian import FisherType, KFACType
from curvlinops_tpu.kfac import math as kmath
from curvlinops_tpu.kfac.chain import (
    KroneckerChainOperator,
    batched_eigh,
    grouped_kron_inverse,
    stacked_kron_inverse,
)
from curvlinops_tpu.kfac.computer import KFACComputer, ParamGroup
from curvlinops_tpu.ops.blockdiag import BlockDiagonalLinearOperator
from curvlinops_tpu.ops.kronecker import KroneckerProductLinearOperator


@functools.partial(jax.jit, static_argnames=("struct",))
def _damped_eig_assembly_program(eig, reig, diag, damping, *, struct):
    """Assemble every exact/rank-r damped-inverse block in ONE program.

    ``struct`` is a hashable ``((gi, kind, n_factors, mode), ...)`` with
    ``mode`` in ``{"lr", "krond", "eig"}``; ``eig``/``reig`` are the
    outputs of ``batched_eigh``/``batched_randomized_eigh`` keyed by
    ``(gi, fi)``; ``diag`` maps embedding blocks to their diagonal factor.
    The per-block eager assembly paid ~5 tunnel dispatches per block.
    """
    from curvlinops_tpu.kfac.randomized import lr_damped_inverse_data

    out = {}
    for gi, kind, nf, mode in struct:
        if mode == "lr":
            out[gi] = lr_damped_inverse_data(
                reig[(gi, 0)], reig[(gi, 1)], damping
            )
        elif mode == "krond":
            lam_G, Q_G = eig[(gi, 0)]
            lam = lam_G[:, None] * diag[gi][None, :]
            out[gi] = (1.0 / (lam + damping), Q_G)
        else:
            lams = [eig[(gi, fi)][0] for fi in range(nf)]
            Qs = [eig[(gi, fi)][1] for fi in range(nf)]
            kron_lam = lams[0]
            for lam in lams[1:]:
                if kind == "skron":  # batched kron over the stack axis
                    kron_lam = (
                        kron_lam[..., :, None] * lam[..., None, :]
                    ).reshape(kron_lam.shape[0], -1)
                else:
                    kron_lam = jnp.kron(kron_lam, lam)
            out[gi] = (1.0 / (kron_lam + damping), Qs)
    return out


def make_to_canonical(
    groups: list[ParamGroup], params: Any
) -> tuple[Callable[[Any], tuple], Callable[[tuple], Any]]:
    """Build pure maps params-pytree <-> tuple of canonical flat blocks.

    Counterpart of ``To/FromCanonicalLinearOperator`` (``kfac_utils.py:263-398``).
    """
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [tuple(p) for p, _ in leaves_with_paths]
    shapes = [jnp.shape(leaf) for _, leaf in leaves_with_paths]
    path_index = {p: i for i, p in enumerate(paths)}

    def to_canonical(v: Any) -> tuple:
        flat = jax.tree_util.tree_leaves(v)
        blocks = []
        for group in groups:
            if group.weight_path is not None:
                use = group.uses[0]
                W = flat[path_index[tuple(group.weight_path)]]
                if group.stack:
                    canon = kmath.canonical_stacked_weight(W, use.kind, use.meta)
                    if group.joint:
                        b = flat[path_index[tuple(group.bias_path)]]
                        canon = jnp.concatenate([canon, b[..., None]], axis=-1)
                else:
                    if use.kind == "dense":
                        canon = kmath.canonical_dense_weight(W, use.meta)
                    elif use.kind == "embedding":
                        canon = kmath.canonical_embedding_weight(W, use.meta)
                    else:
                        canon = kmath.canonical_conv_weight(W, use.meta)
                    if group.joint:
                        b = flat[path_index[tuple(group.bias_path)]]
                        canon = jnp.concatenate([canon, b[:, None]], axis=1)
                blocks.append(canon.reshape(-1))
            else:  # bias-only group (stacked leaves flatten to one block)
                blocks.append(
                    flat[path_index[tuple(group.bias_path)]].reshape(-1)
                )
        return tuple(blocks)

    def from_canonical(blocks: tuple) -> Any:
        out = [None] * len(paths)
        for group, block in zip(groups, blocks):
            if group.weight_path is not None:
                use = group.uses[0]
                i = path_index[tuple(group.weight_path)]
                if group.stack:
                    mat = block.reshape(group.stack, group.d_out, group.d_in)
                    if group.joint:
                        W_canon, b = mat[..., :-1], mat[..., -1]
                        out[path_index[tuple(group.bias_path)]] = b
                    else:
                        W_canon = mat
                    out[i] = kmath.canonical_stacked_weight_inverse(
                        W_canon, use.kind, use.meta, shapes[i]
                    )
                    continue
                mat = block.reshape(group.d_out, group.d_in)
                if group.joint:
                    W_canon, b = mat[:, :-1], mat[:, -1]
                    out[path_index[tuple(group.bias_path)]] = b
                else:
                    W_canon = mat
                if use.kind == "dense":
                    out[i] = kmath.canonical_dense_weight_inverse(
                        W_canon, use.meta, shapes[i]
                    )
                elif use.kind == "embedding":
                    out[i] = kmath.canonical_embedding_weight_inverse(
                        W_canon, use.meta, shapes[i]
                    )
                else:
                    out[i] = kmath.canonical_conv_weight_inverse(
                        W_canon, use.meta, shapes[i]
                    )
            else:
                idx = path_index[tuple(group.bias_path)]
                out[idx] = block.reshape(shapes[idx])
        missing = [paths[i] for i, v in enumerate(out) if v is None]
        if missing:
            raise ValueError(f"Groups do not cover parameters: {missing}.")
        return jax.tree_util.tree_unflatten(treedef, out)

    return to_canonical, from_canonical


class KFACLinearOperator(KroneckerChainOperator):
    r"""Kronecker-factored approximate curvature of the Fisher/GGN.

    ``KFAC = FromCanonical @ blockdiag(ggT_i (x) aaT_i) @ ToCanonical``
    (``kfac.py:219-248``). Configuration mirrors the reference: ``fisher_type``
    in {type-2, mc, empirical, forward-only}, ``mc_samples``, ``kfac_approx``
    in {expand, reduce}, ``separate_weight_and_bias``.

    Backends: the reference's {"hooks", "make_fx"} collapse into the single
    jaxpr backend (hooks need modules; the jaxpr collector is also
    weight-tying-safe where hooks silently are not, ``kfac.py:117-123``).
    """

    SELF_ADJOINT = True

    def __init__(
        self,
        model_fn: Callable,
        loss_fn,
        params: Any,
        data,
        *,
        fisher_type: str = FisherType.MC,
        mc_samples: int = 1,
        kfac_approx: str = KFACType.EXPAND,
        separate_weight_and_bias: bool = True,
        num_data: int | None = None,
        num_per_example_loss_terms: int | None = None,
        seed: int = 2147483647,
        batch_size_fn: Callable | None = None,
        check_deterministic: bool = True,
        mesh=None,
        data_axis: str = "data",
        backend: str = "jaxpr",
        use_pallas: str | bool = "auto",
    ):
        if backend not in ("jaxpr",):
            raise ValueError(
                f"Invalid backend {backend!r}. The reference's 'hooks' and "
                "'make_fx' backends collapse into the single 'jaxpr' backend "
                "here (module hooks do not exist for functional models, and "
                "the jaxpr collector is weight-tying-safe)."
            )
        computer = KFACComputer(
            model_fn,
            loss_fn,
            params,
            data,
            fisher_type=fisher_type,
            mc_samples=mc_samples,
            kfac_approx=kfac_approx,
            separate_weight_and_bias=separate_weight_and_bias,
            num_data=num_data,
            num_per_example_loss_terms=num_per_example_loss_terms,
            seed=seed,
            batch_size_fn=batch_size_fn,
            check_deterministic=check_deterministic,
            mesh=mesh,
            data_axis=data_axis,
            use_pallas=use_pallas,
        )
        aaT, ggT, groups = computer.compute()
        self._build_from_factors(params, groups, aaT, ggT)
        self._computer = computer
        self._mesh, self._data_axis = computer.mesh, computer.data_axis

    # ------------------------------------------------------------------ #
    def _build_from_factors(self, params, groups, aaT, ggT) -> None:
        blocks_data = {}
        for gi, group in enumerate(groups):
            factors = [ggT[gi]]
            if gi in aaT:
                factors.append(aaT[gi])
            if group.input_diag:
                kind = "krond"  # embedding: diagonal input covariance vector
            elif group.stack:
                kind = "skron"
            else:
                kind = "kron"
            blocks_data[gi] = (kind, factors)

        to_canonical, from_canonical = make_to_canonical(groups, params)
        KroneckerChainOperator.__init__(
            self, params, blocks_data, to_canonical, from_canonical
        )
        self._params = params
        self._groups = groups
        self._aaT, self._ggT = aaT, ggT

    @property
    def groups(self) -> list[ParamGroup]:
        """The canonical parameter groups (one per Kronecker block)."""
        return self._groups

    @property
    def canonical(self) -> BlockDiagonalLinearOperator:
        """The block-diagonal operator in the canonical basis."""
        return self.ops[1]

    # ---- matrix properties delegate to the canonical basis (kfac.py:273) - #
    def trace(self) -> jax.Array:
        """Exact trace (basis change preserves it)."""
        return self.canonical.trace()

    def det(self) -> jax.Array:
        """Exact determinant."""
        return self.canonical.det()

    def logdet(self) -> jax.Array:
        """Exact log-determinant."""
        return self.canonical.logdet()

    def frobenius_norm(self) -> jax.Array:
        """Exact Frobenius norm."""
        return self.canonical.frobenius_norm()

    def inverse(
        self,
        damping: float = 0.0,
        use_heuristic_damping: bool = False,
        min_damping: float = 1e-8,
        use_exact_damping: bool = False,
        retry_double_precision: bool = True,
        rank: int | None = None,
        rank_power_iters: int = 1,
        rank_key: jax.Array | None = None,
    ) -> "KroneckerChainOperator":
        """Damped inverse: invert each block, rebuild the chain (kfac.py:311-350).

        The result is again a single-dispatch jitted chain; plain/heuristic
        damping inverts the Kronecker factors (Cholesky, fp64 retry), exact
        damping eigendecomposes them and inverts ``kron(eigvals) + delta``.

        With ``rank`` given (requires ``use_exact_damping=True``), factors
        larger than ``rank`` use a RANDOMIZED rank-``r`` eigendecomposition
        with a trace-preserving tail instead of the full ``eigh``
        (:mod:`curvlinops_tpu.kfac.randomized`, RS-KFAC arXiv:2206.15397) —
        the build becomes matmul-bound on the MXU instead of eigh-bound,
        at the cost of approximating the factor spectra's tails (the damping
        dominates exactly there).  ``rank >= D`` reproduces the exact path.
        ``rank_key`` defaults to a FIXED key so repeated builds are
        deterministic (pass a fresh key to decorrelate).

        Raises:
            ValueError: When both heuristic and exact damping are requested
                (same guard as the reference's ``kronecker.py:283`` — the
                exact-damping branch would otherwise silently ignore the
                heuristic request), or when ``rank`` is given without
                ``use_exact_damping`` / is not a positive int.
        """
        if use_heuristic_damping and use_exact_damping:
            raise ValueError(
                "Choose either heuristic or exact damping, not both."
            )
        if rank is not None:
            if not use_exact_damping:
                raise ValueError(
                    "rank= requires use_exact_damping=True (plain/heuristic "
                    "damping needs no eigendecomposition to begin with)."
                )
            if not isinstance(rank, int) or rank <= 0:
                raise ValueError(f"rank must be a positive int, got {rank!r}.")
        blocks_data = {}
        if use_exact_damping:
            # batch all factor eigendecompositions by shape (one vmapped
            # eigh per distinct factor size across the whole model; stacked
            # factors [L, D, D] eigendecompose batched over the stack)
            flat, flat_rand, lr_kinds = {}, {}, {}
            for gi in sorted(self._blocks_data):
                kind, factors = self._blocks_data[gi]
                if (
                    rank is not None
                    and kind in ("kron", "skron")
                    and len(factors) == 2
                    and all(S.shape[-1] == S.shape[-2] for S in factors)
                    and max(S.shape[-1] for S in factors) > rank
                ):
                    for fi, S in enumerate(factors):
                        flat_rand[(gi, fi)] = S
                    lr_kinds[gi] = kind
                    continue
                if (
                    rank is not None
                    and kind in ("kron", "skron")
                    and len(factors) == 1
                    and factors[0].shape[-1] == factors[0].shape[-2]
                    and factors[0].shape[-1] > rank
                ):
                    # single-factor blocks (bias-only) ride the same sector
                    # machinery with a trivial [1, 1] second factor:
                    # kron(S, [[1]]) == S, so damping semantics are exact —
                    # without this, a 124M GPT's 48 bias blocks went through
                    # full eigh and dominated the whole rank-r build
                    S = factors[0]
                    flat_rand[(gi, 0)] = S
                    flat_rand[(gi, 1)] = jnp.ones(
                        S.shape[:-2] + (1, 1), S.dtype
                    )
                    lr_kinds[gi] = kind
                    continue
                for fi, S in enumerate(factors):
                    if kind == "krond" and fi == 1:
                        continue  # diagonal factor: already its own spectrum
                    flat[(gi, fi)] = S
            mesh = getattr(self, "_mesh", None)
            if mesh is not None:
                eig = batched_eigh(
                    flat, mesh=mesh,
                    data_axis=getattr(self, "_data_axis", "data"),
                )
            else:
                # one program: eager per-shape dispatches pay a tunnel
                # round trip each (profile_rank_phases.py A/B)
                from curvlinops_tpu.kfac.chain import _batched_eigh_program

                eig = _batched_eigh_program(flat) if flat else {}
            reig = {}
            if flat_rand:
                from curvlinops_tpu.kfac.randomized import (
                    _batched_randomized_eigh_program,
                    batched_randomized_eigh,
                )

                rkey = jax.random.key(0) if rank_key is None else rank_key
                if mesh is not None:
                    reig = batched_randomized_eigh(
                        flat_rand, rank, rkey,
                        power_iters=rank_power_iters, mesh=mesh,
                        data_axis=getattr(self, "_data_axis", "data"),
                    )
                else:
                    reig = _batched_randomized_eigh_program(
                        flat_rand, rank, rkey, rank_power_iters
                    )
            # assemble every block's damped inverse data in ONE jitted
            # program (the per-block eager kron/reciprocal/sector ops cost
            # ~5 tunnel dispatches per block; measured seconds of pure
            # latency on the 124M GPT's 48 blocks)
            struct, diag = [], {}
            for gi in sorted(self._blocks_data):
                kind, factors = self._blocks_data[gi]
                if gi in lr_kinds:
                    struct.append((gi, kind, 2, "lr"))
                elif kind == "krond":
                    struct.append((gi, kind, 2, "krond"))
                    diag[gi] = factors[1]
                else:
                    struct.append((gi, kind, len(factors), "eig"))
            assembled = _damped_eig_assembly_program(
                eig, reig, diag, damping, struct=tuple(struct)
            )
            for gi, kind, _, mode in struct:
                if mode == "lr":
                    out_kind = "slreigh" if kind == "skron" else "lreigh"
                elif mode == "krond":
                    out_kind = "eighd"
                else:
                    out_kind = "seigh" if kind == "skron" else "eigh"
                blocks_data[gi] = (out_kind, assembled[gi])
        else:
            # all kron/skron blocks invert in ONE jitted program with a
            # single flag readback (chain.py::grouped_kron_inverse) — the
            # per-block path pays 2-4 tunnel round trips per block; on the
            # rare Cholesky NaN it returns None and the per-block fp64-retry
            # path below handles exactly the failing blocks
            inv_plain = grouped_kron_inverse(
                {
                    gi: v
                    for gi, v in self._blocks_data.items()
                    if v[0] in ("kron", "skron")
                },
                damping,
                use_heuristic_damping,
                min_damping,
            )
            for gi in sorted(self._blocks_data):
                kind, factors = self._blocks_data[gi]
                if kind == "krond":
                    from curvlinops_tpu.ops.kronecker import (
                        EmbeddingKroneckerOperator,
                    )

                    inv = EmbeddingKroneckerOperator(*factors).inverse(
                        damping=damping,
                        use_heuristic_damping=use_heuristic_damping,
                        min_damping=min_damping,
                        use_exact_damping=False,
                        retry_double_precision=retry_double_precision,
                    )
                    blocks_data[gi] = ("krond", inv.factors)
                elif inv_plain is not None:
                    blocks_data[gi] = (kind, inv_plain[gi])
                elif kind == "skron":
                    inv_factors = stacked_kron_inverse(
                        factors,
                        damping,
                        use_heuristic_damping,
                        min_damping,
                        retry_double_precision,
                    )
                    blocks_data[gi] = ("skron", inv_factors)
                else:
                    block = KroneckerProductLinearOperator(*factors)
                    inv = block.inverse(
                        damping=damping,
                        use_heuristic_damping=use_heuristic_damping,
                        min_damping=min_damping,
                        use_exact_damping=False,
                        retry_double_precision=retry_double_precision,
                    )
                    blocks_data[gi] = ("kron", inv.factors)
        return KroneckerChainOperator(
            self._params, blocks_data, self._to_canonical, self._from_canonical
        )

    # ---- checkpointing (torch.save/load parity, test_kfac.py:1083) ------- #
    def state_dict(self) -> dict:
        """Serializable factor state (a pytree of arrays + group metadata)."""
        return {
            "aaT": {str(k): v for k, v in self._aaT.items()},
            "ggT": {str(k): v for k, v in self._ggT.items()},
        }

    def load_state_dict(self, state: dict) -> None:
        """Restore factors and rebuild the chain."""
        aaT = {int(k): jnp.asarray(v) for k, v in state["aaT"].items()}
        ggT = {int(k): jnp.asarray(v) for k, v in state["ggT"].items()}
        self._build_from_factors(self._params, self._groups, aaT, ggT)
        self.invalidate_traced()

    @classmethod
    def from_state_dict(
        cls, state: dict, model_fn: Callable, loss_fn, params: Any, data, **kwargs
    ) -> "KFACLinearOperator":
        """Rebuild an operator from checkpointed factors without recomputing.

        The reference restores a pickled operator with its factors inline
        (``torch.load``, ``test_kfac.py:1083``); this is the functional
        equivalent. ``data`` is still traced for layer discovery and dataset
        statistics, but NO curvature accumulation pass runs. Determinism
        checking defaults to off (nothing stochastic is computed).
        """
        kwargs.setdefault("check_deterministic", False)
        backend = kwargs.pop("backend", "jaxpr")  # constructor-parity kwarg
        if backend not in ("jaxpr",):
            raise ValueError(f"Invalid backend {backend!r}.")
        self = cls.__new__(cls)
        computer = KFACComputer(model_fn, loss_fn, params, data, **kwargs)
        aaT = {int(k): jnp.asarray(v) for k, v in state["aaT"].items()}
        ggT = {int(k): jnp.asarray(v) for k, v in state["ggT"].items()}
        self._build_from_factors(params, computer.groups, aaT, ggT)
        self._computer = computer
        self._mesh, self._data_axis = computer.mesh, computer.data_axis
        return self
