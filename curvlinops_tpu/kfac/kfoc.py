"""KFOC: Frobenius-optimal rank-one Kronecker approximation of the GGN.

Counterpart of the reference ``KFOCLinearOperator`` (``curvlinops/kfoc.py``,
``computers/kfoc_make_fx.py``): per weight group, the best rank-one Kronecker
approximation ``S_1 (x) S_2`` of the layer GGN block
``G = sum_{v,n} vec(P_vn) vec(P_vn)^T`` comes from the top singular pair of
the Van Loan rearrangement ``R(G) vec(M) = vec(sum P M P^T)``.

Where the reference escapes to SciPy's ARPACK ``svds`` on a host-exported
operator (``kfoc_make_fx.py:123-175``), the top pair here is computed by
alternating power iteration on ``R`` / ``R^T`` entirely on device — both
directions are two einsums over the per-sample gradient stack, so the whole
build is one jitted program. Factors are NOT symmetrized or PSD-projected
(``kfoc.py:27-31``). Bias-only groups store the exact GGN block (the
single-factor Frobenius optimum).

Scope matches the reference: single-batch data, ``fisher_type`` in
{TYPE2, MC}, EXPAND only.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from curvlinops_tpu.curvature.ef import flatten_prediction, flatten_target
from curvlinops_tpu.curvature.loss_hessian import (
    FisherType,
    KFACType,
    make_grad_output_fn,
    mean_rescale,
)
from curvlinops_tpu.kfac import math as kmath
from curvlinops_tpu.kfac.computer import KFACComputer
from curvlinops_tpu.kfac.operator import KFACLinearOperator


def top_rank_one_kron_factors(
    P: jax.Array, num_iters: int = 2000, tol: float | None = None
) -> tuple[jax.Array, jax.Array, dict]:
    """Top singular pair of the Van Loan rearrangement, by power iteration.

    The alternating ``R`` / ``R^T`` iteration runs inside a residual-driven
    ``lax.while_loop``: it stops as soon as the relative singular-pair
    residual ``||R^T(U) - sigma V||_F / sigma`` drops below ``tol`` (typical
    well-separated pairs take tens of steps — cheaper than any fixed count),
    and keeps iterating up to ``num_iters`` when the top pair is
    near-degenerate (the reference iterates ARPACK ``svds`` to tolerance,
    ``kfoc_make_fx.py:123-175``; a fixed count silently returned unconverged
    factors there).

    Stopping: the loop exits on ``res <= tol``, on the iteration cap, or on
    STAGNATION — less than 2% residual improvement over the last 100 steps.
    The f32 recurrence has an asymptotic residual floor (~1.5e-7 at small
    sizes, growing with the contraction length) that sits ABOVE machine eps,
    so a tolerance alone either never triggers (every group silently burns
    the full ``num_iters``) or must be loosened past what near-degenerate
    pairs need; the stagnation rule stops at the floor instead, wherever it
    lies. The window is deliberately loose: a near-degenerate pair
    (sigma2/sigma1 = 0.998) shows a long transient with only ~2% improvement
    per 50 steps before its asymptotic rate kicks in, and must NOT be cut
    off there.

    Args:
        P: Per-sample ``vec(W)`` gradients ``[V, N, d_out, d_in]`` scaled so
            ``G = sum vec(P) vec(P)^T`` is the layer GGN block.
        num_iters: Iteration cap.
        tol: Relative residual tolerance for early stopping. Default
            ``10 * eps`` of ``P``'s dtype (f32: ~1.2e-6; reached in ~20
            steps on well-separated pairs).

    Returns:
        ``(S_1 [d_out, d_out], S_2 [d_in, d_in], info)`` with
        ``S_1 (x) S_2 ~= argmin ||G - S_1 (x) S_2||_F`` over rank-one
        Kronecker approximations; zero blocks for ``G = 0``. ``info`` carries
        ``iterations``, ``residual`` (relative), and ``sigma`` as device
        scalars.
    """
    d_out, d_in = P.shape[2], P.shape[3]
    if tol is None:
        tol = 10 * float(jnp.finfo(P.dtype).eps)
    eps = jnp.finfo(P.dtype).tiny
    stall_limit, improvement = 100, 0.98

    def R(M):  # [d_in, d_in] -> [d_out, d_out]
        return jnp.einsum("vnor,rc,vnpc->op", P, M, P)

    def RT(U):  # [d_out, d_out] -> [d_in, d_in]
        return jnp.einsum("vnor,op,vnpc->rc", P, U, P)

    V0 = jnp.eye(d_in, dtype=P.dtype)
    V0 = V0 / jnp.linalg.norm(V0)
    big = jnp.asarray(jnp.inf, P.dtype)

    def cond(carry):
        _, _, res, k, _best, stall = carry
        return jnp.logical_and(
            k < num_iters,
            jnp.logical_and(res > tol, stall < stall_limit),
        )

    def body(carry):
        V, _sigma, _res, k, best, stall = carry
        U = R(V)
        U = U / jnp.maximum(jnp.linalg.norm(U), eps)
        W = RT(U)
        sigma = jnp.linalg.norm(W)
        V_new = W / jnp.maximum(sigma, eps)
        # relative singular-pair residual; exact 0 block converges instantly
        res = jnp.linalg.norm(W - sigma * V) / jnp.maximum(sigma, eps)
        res = jnp.where(sigma <= eps, 0.0, res)
        improved = res < best * improvement
        best = jnp.where(improved, res, best)
        stall = jnp.where(improved, 0, stall + 1)
        return V_new, sigma, res, k + 1, best, stall

    V, sigma, res, iters, _, _ = jax.lax.while_loop(
        cond,
        body,
        (V0, jnp.zeros((), P.dtype), big, jnp.asarray(0), big,
         jnp.asarray(0)),
    )
    U = R(V)
    U = U / jnp.maximum(jnp.linalg.norm(U), eps)
    scale = jnp.sqrt(sigma)
    S_1 = scale * U
    S_2 = scale * V
    # G = 0 -> sigma = 0 -> factors are exactly zero via the sqrt scale
    info = {"iterations": iters, "residual": res, "sigma": sigma}
    return S_1, S_2, info


class KFOCComputer(KFACComputer):
    """Single-batch computer for KFOC's per-sample-gradient SVD factors."""

    def __init__(self, *args, power_iters: int = 2000, power_tol: float | None = None,
                 **kwargs):
        kwargs.setdefault("kfac_approx", KFACType.EXPAND)
        self.power_iters, self.power_tol = power_iters, power_tol
        super().__init__(*args, **kwargs)
        if self.fisher_type not in (FisherType.TYPE2, FisherType.MC):
            raise ValueError(
                f"KFOC supports TYPE2/MC fisher types, got {self.fisher_type}."
            )
        if KFACType(self.kfac_approx) != KFACType.EXPAND:
            raise ValueError("KFOC supports KFACType.EXPAND only.")
        if any(group.stack for group in self.groups):
            raise ValueError(
                "KFOC does not support scan-stacked layers; unroll the scan "
                "or use KFAC/EKFAC."
            )
        if any(group.input_diag for group in self.groups):
            raise ValueError(
                "KFOC does not support embedding layers; use KFAC."
            )
        batches = list(self.data)
        if len(batches) != 1:
            raise ValueError(
                f"KFOC requires a single batch, got {len(batches)}."
            )

    def compute_kfoc(self) -> tuple[dict, dict, list]:
        """Return ``({gi: S_2 or None}, {gi: S_1 or bias block}, groups)``."""
        X, y = next(iter(self.data))
        traced = self._get_traced(X)
        groups = self.groups
        grad_output_fn = make_grad_output_fn(
            self.loss_fn, self.fisher_type, self.mc_samples
        )
        loss_fn, kfac_approx = self.loss_fn, self.kfac_approx
        B = self.batch_size_fn(X)
        correction = kmath.loss_correction(
            B,
            self.num_per_example_loss_terms,
            loss_fn.reduction,
            self.num_data,
        )

        @jax.jit
        def kernel(frozen, params, X, y, key, corr):
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
            G_pred = self._unflatten_rows(G_rows, jnp.shape(pred))
            ios_zero = [jnp.zeros_like(i) for i in ios]
            gates_zero = [jnp.zeros_like(g) for g in gates]
            glayers = jax.vmap(
                lambda gp: pull((gp, ios_zero, gates_zero))[0]
            )(G_pred)

            first, second, infos = {}, {}, {}
            # ignore_index static->masked-loss convention (see computer.py);
            # KFOC is TYPE2/MC-only, so the rescale always applies
            sqrt_corr = jnp.sqrt(corr * mean_rescale(loss_fn, y))
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
                if group.weight_path is None:
                    Pb = sqrt_corr * jnp.sum(g, axis=2)  # [V, N, d_out]
                    first[gi] = jnp.einsum("vnr,vnc->rc", Pb, Pb)
                    continue
                a_parts = [
                    kmath.input_to_sharing_format(
                        ios[u.layer_id],
                        u.kind,
                        u.meta,
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
                Pw = sqrt_corr * jnp.einsum("vnsi,nsj->vnij", g, a)
                S_1, S_2, info = top_rank_one_kron_factors(
                    Pw, num_iters=self.power_iters, tol=self.power_tol
                )
                first[gi], second[gi] = S_1, S_2
                infos[gi] = info
            return first, second, infos

        run_params = self.params
        if self.mesh is not None:
            # data-parallel build: shard the (single) batch over the mesh's
            # data axis with replicated params; GSPMD partitions the
            # per-sample-gradient einsums and inserts the batch-sum psums
            from curvlinops_tpu.parallel.mesh import replicate, shard_batch

            run_params = replicate(self.params, self.mesh)
            X = shard_batch(X, self.mesh, self.data_axis)
            y = shard_batch(y, self.mesh, self.data_axis)

        first, second, infos = kernel(
            self.frozen,
            run_params,
            X,
            y,
            jax.random.key(self.seed),
            jnp.float32(correction),
        )
        self.power_info = infos
        return second, first, groups


class KFOCLinearOperator(KFACLinearOperator):
    """Frobenius-optimal rank-one Kronecker proxy of the GGN.

    Warning:
        Factors are not symmetrized or PSD-projected (``kfoc.py:27-31``);
        verify before using with routines that assume PSD factors.
    """

    def __init__(
        self,
        model_fn,
        loss_fn,
        params: Any,
        data,
        *,
        fisher_type: str = FisherType.MC,
        mc_samples: int = 1,
        separate_weight_and_bias: bool = True,
        num_data: int | None = None,
        num_per_example_loss_terms: int | None = None,
        seed: int = 2147483647,
        batch_size_fn=None,
        check_deterministic: bool = True,
        mesh=None,
        data_axis: str = "data",
        power_iters: int = 2000,
        power_tol: float | None = None,
    ):
        computer = KFOCComputer(
            model_fn,
            loss_fn,
            params,
            data,
            fisher_type=fisher_type,
            mc_samples=mc_samples,
            separate_weight_and_bias=separate_weight_and_bias,
            num_data=num_data,
            num_per_example_loss_terms=num_per_example_loss_terms,
            seed=seed,
            batch_size_fn=batch_size_fn,
            check_deterministic=check_deterministic,
            mesh=mesh,
            data_axis=data_axis,
            power_iters=power_iters,
            power_tol=power_tol,
        )
        aaT, ggT, groups = computer.compute_kfoc()
        self._build_from_factors(params, groups, aaT, ggT)
        self._computer = computer
        #: per-group power-iteration convergence info
        #: ({group_index: {"iterations", "residual", "sigma"}})
        self.power_info = computer.power_info
