"""EKFAC: eigenvalue-corrected KFAC.

Counterpart of the reference ``EKFACLinearOperator`` (``curvlinops/ekfac.py``)
with the computer logic of ``computers/ekfac_hooks.py`` / ``ekfac_make_fx.py``:
after the KFAC factor build, each factor is eigendecomposed and a second data
pass accumulates the corrected eigenvalues
``lambda = sum_{v,n} (Q_g^T P_vn Q_a)^2`` — the Frobenius-optimal diagonal in
the Kronecker eigenbasis (George et al., 2018). The dual contraction strategy
(per-example-gradient vs Gramian, auto-selected by memory,
``ekfac_hooks.py:103-238``) lives in :func:`curvlinops_tpu.kfac.math.eigenvalue_correction`
and runs inside the same jitted per-batch kernel as the backward pass.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from curvlinops_tpu.curvature.ef import flatten_prediction, flatten_target
from curvlinops_tpu.curvature.loss_hessian import (
    FisherType,
    make_grad_output_fn,
    mean_rescale,
)
from curvlinops_tpu.kfac import math as kmath
from curvlinops_tpu.kfac.chain import KroneckerChainOperator, batched_eigh
from curvlinops_tpu.kfac.computer import KFACComputer
from curvlinops_tpu.kfac.operator import KFACLinearOperator, make_to_canonical


class EKFACComputer(KFACComputer):
    """KFAC computer + factor eigendecomposition + eigenvalue-correction pass.

    With ``rank`` given, factor pairs larger than ``rank`` replace the full
    ``eigh`` with a RANDOMIZED rank-``r`` basis
    (:func:`curvlinops_tpu.kfac.randomized.batched_randomized_eigh`) and the
    correction pass accumulates the four sector statistics of
    :func:`curvlinops_tpu.kfac.randomized.lr_sector_stats` instead of the
    full ``[D1, D2]`` grid — the build becomes matmul-bound (the corrected
    spectra live on span x span plus Frobenius-optimal complement means).
    """

    _SUPPORTED_FISHER = (FisherType.TYPE2, FisherType.MC, FisherType.EMPIRICAL)

    def __init__(
        self,
        *args,
        force_strategy: str | None = None,
        rank: int | None = None,
        rank_power_iters: int = 1,
        rank_key: jax.Array | None = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        if rank is not None and (not isinstance(rank, int) or rank <= 0):
            raise ValueError(f"rank must be a positive int, got {rank!r}.")
        self.rank = rank
        self.rank_power_iters = rank_power_iters
        self.rank_key = rank_key
        if self.fisher_type not in self._SUPPORTED_FISHER:
            raise ValueError(
                f"EKFAC supports fisher types {self._SUPPORTED_FISHER}, got "
                f"{self.fisher_type}."
            )
        for g in self.groups:
            if g.input_diag and g.uses[0].meta.get("scan") is not None:
                raise ValueError(
                    "EKFAC does not support embedding lookups inside a scan; "
                    "use KFAC or hoist the lookup out of the scan."
                )
        # EKFAC's per-sample gradients require independent per-datum loss
        # terms: reject >2d model output (computers/_base.py:329-353)
        X0, y0 = next(iter(self.data))
        pred_shape = jax.eval_shape(self.model_fn, self.params, X0).shape
        if len(pred_shape) != 2:
            raise ValueError(
                f"EKFAC supports 2d model output only, got shape {pred_shape}."
            )
        self._force_strategy = force_strategy
        self._corr_kernel_cache: dict = {}
        self._lr_gis: set = set()

    def compute_ekfac(self) -> tuple[dict, dict, dict, list]:
        """Return ``(Q_a, Q_g, corrected_eigenvalues, groups)``."""
        aaT, ggT, groups = self.compute()
        # embedding groups: the diagonal input covariance's eigenbasis is the
        # identity — no eigh, and no Q_a entry (the chain stores Q_g only)
        diag_gis = {gi for gi, g in enumerate(groups) if g.input_diag}
        # rank-r route: two-factor groups with a factor larger than rank get
        # randomized partial bases; everything else keeps the exact eigh
        lr_gis: set = set()
        if self.rank is not None:
            for gi in ggT:  # bias-only groups have no aaT entry
                if gi in diag_gis:
                    continue
                dims = [ggT[gi].shape[-1]]
                if gi in aaT:
                    dims.append(aaT[gi].shape[-1])
                if max(dims) > self.rank:
                    lr_gis.add(gi)
        self._lr_gis = lr_gis
        flat_a = {
            gi: v
            for gi, v in aaT.items()
            if gi not in diag_gis and gi not in lr_gis
        }
        flat_g = {gi: v for gi, v in ggT.items() if gi not in lr_gis}
        if self.mesh is not None:
            eig_a = batched_eigh(
                flat_a, mesh=self.mesh, data_axis=self.data_axis
            )
            eig_g = batched_eigh(
                flat_g, mesh=self.mesh, data_axis=self.data_axis
            )
        else:
            # one program per side: eager per-shape dispatches pay a
            # tunnel round trip each (profile_rank_phases.py A/B)
            from curvlinops_tpu.kfac.chain import _batched_eigh_program

            eig_a = _batched_eigh_program(flat_a) if flat_a else {}
            eig_g = _batched_eigh_program(flat_g) if flat_g else {}
        Q_a = {gi: v for gi, (_, v) in eig_a.items()}
        Q_g = {gi: v for gi, (_, v) in eig_g.items()}
        if lr_gis:
            from curvlinops_tpu.kfac.randomized import (
                _batched_randomized_eigh_program,
                batched_randomized_eigh,
            )

            lr_mats = {
                (gi, side): mats[gi]
                for gi in lr_gis
                for side, mats in (("a", aaT), ("g", ggT))
                if gi in mats  # bias-only groups: g side only
            }
            rkey = (
                jax.random.key(0) if self.rank_key is None else self.rank_key
            )
            if self.mesh is not None:
                reig = batched_randomized_eigh(
                    lr_mats, self.rank, rkey,
                    power_iters=self.rank_power_iters,
                    mesh=self.mesh, data_axis=self.data_axis,
                )
            else:
                reig = _batched_randomized_eigh_program(
                    lr_mats, self.rank, rkey, self.rank_power_iters
                )
            for gi in lr_gis:
                # partial bases only — EKFAC recomputes the spectra anyway
                if (gi, "a") in reig:
                    Q_a[gi] = reig[(gi, "a")][1]
                Q_g[gi] = reig[(gi, "g")][1]
        # free the covariance stacks before the correction pass — only the
        # eigenvectors are needed, and a 124M-GPT's factors are ~2 GiB
        del aaT, ggT, eig_a, eig_g

        base_key = jax.random.key(self.seed)
        params = self.params
        if self.mesh is not None:
            from curvlinops_tpu.parallel.mesh import replicate

            params = replicate(params, self.mesh)
        lambdas: dict = {}
        for idx, (X, y) in enumerate(self.data):
            if self.mesh is not None:
                from curvlinops_tpu.parallel.mesh import shard_batch

                X = shard_batch(X, self.mesh, self.data_axis)
                y = shard_batch(y, self.mesh, self.data_axis)
            kernel = self._get_corr_kernel(X)
            B = self.batch_size_fn(X)
            correction = kmath.loss_correction(
                B,
                self.num_per_example_loss_terms,
                self.loss_fn.reduction,
                self.num_data,
            )
            out = kernel(
                params,
                X,
                y,
                jax.random.fold_in(base_key, idx),
                jnp.float32(correction),
                Q_a,
                Q_g,
            )
            for gi, val in out.items():
                # rank-r groups carry 4-tuples of sector sums; tree-add
                lambdas[gi] = (
                    val
                    if gi not in lambdas
                    else jax.tree.map(jnp.add, lambdas[gi], val)
                )
        return Q_a, Q_g, lambdas, groups

    def _get_corr_kernel(self, X: Any) -> Callable:
        shape_key = tuple(
            (tuple(jnp.shape(leaf)), str(jnp.result_type(leaf)))
            for leaf in jax.tree.leaves(X)
        )
        if shape_key not in self._corr_kernel_cache:
            traced = self._get_traced(X)
            jitted = jax.jit(self._make_corr_kernel(traced))
            frozen = self.frozen
            self._corr_kernel_cache[shape_key] = (
                lambda *args: jitted(frozen, *args)
            )
        return self._corr_kernel_cache[shape_key]

    def _make_corr_kernel(self, traced) -> Callable:
        loss_fn = self.loss_fn
        groups, kfac_approx = self.groups, self.kfac_approx
        force_strategy = self._force_strategy
        lr_gis = frozenset(self._lr_gis)
        grad_output_fn = make_grad_output_fn(
            loss_fn, self.fisher_type, self.mc_samples
        )

        def corr_kernel(frozen, params, X, y, key, correction, Q_a, Q_g):
            delta0 = [
                jnp.zeros(s.shape, s.dtype) for s in traced.delta_specs(params, X)
            ]
            (pred, ios, gates), pull = jax.vjp(
                lambda d: traced.apply_with_io(params, d, X, frozen), delta0
            )
            rows = flatten_prediction(loss_fn, jax.lax.stop_gradient(pred))
            y_rows = flatten_target(loss_fn, y)
            L = rows.shape[0]
            keys = jax.random.split(key, L)
            G_rows = jnp.moveaxis(jax.vmap(grad_output_fn)(rows, y_rows, keys), 1, 0)
            if loss_fn.reduction == "mean":
                G_rows = G_rows / L
            # ignore_index static->masked-loss convention (see computer.py;
            # applies to EVERY fisher type)
            corr_eff = correction * mean_rescale(loss_fn, y)
            G_pred = G_rows.reshape(G_rows.shape[0], *jnp.shape(pred))
            ios_zero = [jnp.zeros_like(i) for i in ios]
            gates_zero = [jnp.zeros_like(g) for g in gates]
            glayers = jax.vmap(
                lambda gp: pull((gp, ios_zero, gates_zero))[0]
            )(G_pred)

            out = {}
            for gi, group in enumerate(groups):
                g_parts = [
                    kmath.grad_to_sharing_format(
                        glayers[u.layer_id],
                        u.kind,
                        traced.layers[u.layer_id].meta,
                        kfac_approx,
                    )
                    for u in group.uses
                ]
                g = (
                    g_parts[0]
                    if len(g_parts) == 1
                    else jnp.concatenate(g_parts, axis=2)
                )
                if group.input_diag:
                    # tied tables: g concatenated the uses along the sharing
                    # axis, so the token indices must concatenate the same
                    # way ([B, S_u] each -> [B, sum S_u])
                    idx_parts = [
                        jnp.reshape(
                            ios[u.layer_id], (jnp.shape(ios[u.layer_id])[0], -1)
                        )
                        for u in group.uses
                    ]
                    idx = (
                        idx_parts[0]
                        if len(idx_parts) == 1
                        else jnp.concatenate(idx_parts, axis=1)
                    )
                    lam = kmath.eigenvalue_correction_embedding(
                        g, Q_g[gi], idx, group.d_in
                    )
                elif group.weight_path is None:
                    if gi in lr_gis:
                        # bias-only lr group: trivial input side (the bias
                        # "input" is the constant 1) — same sector stats
                        # with a one-dim a-basis, kron(S, [[1]]) == S
                        from curvlinops_tpu.kfac.randomized import (
                            lr_sector_stats,
                        )

                        if g.ndim == 5:  # stacked [L, V, B, S, D1]
                            a1 = jnp.ones(
                                (g.shape[0],) + g.shape[2:4] + (1,), g.dtype
                            )
                            Ua1 = jnp.ones((g.shape[0], 1, 1), g.dtype)
                        else:  # [V, B, S, D1]
                            a1 = jnp.ones(g.shape[1:3] + (1,), g.dtype)
                            Ua1 = jnp.ones((1, 1), g.dtype)
                        lam = lr_sector_stats(g, Q_g[gi], a1, Ua1)
                    else:
                        lam = kmath.eigenvalue_correction(
                            g, Q_g[gi], None, None, force_strategy
                        )
                else:
                    a_parts = [
                        kmath.input_to_sharing_format(
                            ios[u.layer_id],
                            u.kind,
                            traced.layers[u.layer_id].meta,
                            kfac_approx,
                            bias_pad=(
                                None
                                if not group.joint
                                else (1.0 if u.bias_path is not None else 0.0)
                            ),
                        )
                        for u in group.uses
                    ]
                    a = (
                        a_parts[0]
                        if len(a_parts) == 1
                        else jnp.concatenate(a_parts, axis=1)
                    )
                    if gi in lr_gis:
                        from curvlinops_tpu.kfac.randomized import (
                            lr_sector_stats,
                        )

                        lam = lr_sector_stats(g, Q_g[gi], a, Q_a[gi])
                    else:
                        lam = kmath.eigenvalue_correction(
                            g, Q_g[gi], a, Q_a[gi], force_strategy
                        )
                out[gi] = jax.tree.map(lambda t: corr_eff * t, lam)
            return out

        return corr_kernel


class EKFACLinearOperator(KFACLinearOperator):
    """EKFAC operator: eigendecomposed canonical blocks with corrected spectra.

    Canonical block: ``EighDecomposed(lambda, Kron(Q_g, Q_a))``
    (``ekfac.py:34-67``); ``inverse(damping)`` is ``1/(lambda+delta)`` in the
    same basis (``ekfac.py:69-86``).

    With ``rank=r`` (plus optional ``rank_power_iters``/``rank_key``),
    factor pairs larger than ``r`` use randomized partial eigenbases and
    4-sector corrected spectra (:mod:`curvlinops_tpu.kfac.randomized`) —
    the eigh-bound build phase becomes matmul-bound. ``rank >= D``
    reproduces the exact path; sufficient rank (> the factors' true rank,
    e.g. small batches) is exact up to float roundoff.
    """

    def __init__(self, model_fn, loss_fn, params, data, **kwargs):
        force_strategy = kwargs.pop("force_strategy", None)
        rank_kwargs = {
            k: kwargs.pop(k)
            for k in ("rank", "rank_power_iters", "rank_key")
            if k in kwargs
        }
        computer = EKFACComputer(
            model_fn, loss_fn, params, data, force_strategy=force_strategy,
            **rank_kwargs, **kwargs,
        )
        Q_a, Q_g, lambdas, groups = computer.compute_ekfac()
        self._params, self._groups = params, groups
        self._Q_a, self._Q_g, self._lambdas = Q_a, Q_g, lambdas
        self._rebuild_chain()
        self._computer = computer

    def _rebuild_chain(self) -> None:
        from curvlinops_tpu.kfac.randomized import lr_corrected_data

        blocks_data = {}
        for gi, group in enumerate(self._groups):
            lam = self._lambdas[gi]
            if isinstance(lam, (tuple, list)):
                # rank-r group: accumulated sector sums -> sector spectra;
                # bias-only groups carry a trivial one-dim a-basis
                Qa = self._Q_a.get(gi)
                if Qa is None:
                    Qg = self._Q_g[gi]
                    Qa = jnp.ones(
                        ((Qg.shape[0], 1, 1) if Qg.ndim == 3 else (1, 1)),
                        Qg.dtype,
                    )
                data = lr_corrected_data(self._Q_g[gi], Qa, tuple(lam))
                kind = "slreigh" if group.stack else "lreigh"
                blocks_data[gi] = (kind, data)
                continue
            if group.input_diag:
                blocks_data[gi] = (
                    "eighd",
                    (lam.reshape(group.d_out, group.d_in), self._Q_g[gi]),
                )
                continue
            Qs = (
                [self._Q_g[gi], self._Q_a[gi]]
                if gi in self._Q_a
                else [self._Q_g[gi]]
            )
            if group.stack:
                blocks_data[gi] = ("seigh", (lam.reshape(group.stack, -1), Qs))
            else:
                blocks_data[gi] = ("eigh", (lam.reshape(-1), Qs))
        to_canonical, from_canonical = make_to_canonical(self._groups, self._params)
        KroneckerChainOperator.__init__(
            self, self._params, blocks_data, to_canonical, from_canonical
        )

    @property
    def corrected_eigenvalues(self) -> dict:
        """Per-group corrected eigenvalues.

        Rank-``r`` groups hold their accumulated sector sums
        ``(lam11, row_g, col_a, total)`` instead of a dense grid (see
        :func:`curvlinops_tpu.kfac.randomized.lr_corrected_data`).
        """
        return self._lambdas

    def inverse(self, damping: float = 0.0) -> KroneckerChainOperator:
        """Damped inverse ``1/(lambda+delta)`` in the Kronecker eigenbasis.

        Rank-``r`` sector blocks invert in the same sector decomposition
        (it diagonalizes both the spectrum and its damped inverse).
        """
        from curvlinops_tpu.kfac.randomized import lr_map_scales

        blocks_data = {}
        for gi in sorted(self._blocks_data):
            kind, payload = self._blocks_data[gi]
            if kind in ("lreigh", "slreigh"):
                blocks_data[gi] = (
                    kind,
                    lr_map_scales(payload, lambda s: 1.0 / (s + damping)),
                )
            else:
                lam, Qs = payload
                blocks_data[gi] = (kind, (1.0 / (lam + damping), Qs))
        return KroneckerChainOperator(
            self._params, blocks_data, self._to_canonical, self._from_canonical
        )

    def state_dict(self) -> dict:  # noqa: D102
        return {
            "Q_a": {str(k): v for k, v in self._Q_a.items()},
            "Q_g": {str(k): v for k, v in self._Q_g.items()},
            "lambdas": {str(k): v for k, v in self._lambdas.items()},
        }

    def load_state_dict(self, state: dict) -> None:  # noqa: D102
        self._Q_a = {int(k): jnp.asarray(v) for k, v in state["Q_a"].items()}
        self._Q_g = {int(k): jnp.asarray(v) for k, v in state["Q_g"].items()}
        self._lambdas = {
            int(k): (
                tuple(jnp.asarray(x) for x in v)  # rank-r sector sums
                if isinstance(v, (tuple, list))
                else jnp.asarray(v)
            )
            for k, v in state["lambdas"].items()
        }
        self._rebuild_chain()
        self.invalidate_traced()

    @classmethod
    def from_state_dict(
        cls, state: dict, model_fn, loss_fn, params, data, **kwargs
    ) -> "EKFACLinearOperator":
        """Rebuild from checkpointed eigenbases/eigenvalues without the two
        data passes (see :meth:`KFACLinearOperator.from_state_dict`)."""
        kwargs.setdefault("check_deterministic", False)
        force_strategy = kwargs.pop("force_strategy", None)
        self = cls.__new__(cls)
        computer = EKFACComputer(
            model_fn, loss_fn, params, data, force_strategy=force_strategy,
            **kwargs,
        )
        self._params, self._groups = params, computer.groups
        self._computer = computer
        self._mesh = computer.mesh
        self._data_axis = computer.data_axis
        self.load_state_dict(state)
        return self
