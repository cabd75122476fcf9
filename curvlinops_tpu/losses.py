"""Loss functions with the structure curvature operators need.

The reference dispatches on ``torch.nn`` loss modules (MSELoss,
CrossEntropyLoss, BCEWithLogitsLoss) and reads their ``reduction`` attribute.
Here losses are small frozen dataclasses that (a) are callables
``(prediction, target) -> scalar`` with torch-identical numerics so that
outputs match the reference within tolerance, and (b) expose closed-form
structure (Hessian square roots, grad-output samplers) via
``curvlinops_tpu.curvature.loss_hessian``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Loss:
    """Base class: a reduction-aware scalar loss ``(pred, y) -> scalar``."""

    reduction: str = "mean"

    def __post_init__(self):  # noqa: D105
        if self.reduction not in ("mean", "sum"):
            raise ValueError(f"Unsupported reduction {self.reduction!r}.")

    def _reduce(self, elementwise: jax.Array) -> jax.Array:
        return (
            jnp.mean(elementwise) if self.reduction == "mean" else jnp.sum(elementwise)
        )


@dataclass(frozen=True)
class MSELoss(Loss):
    """Squared error, reduced over all elements (torch ``nn.MSELoss``)."""

    def __call__(self, prediction: jax.Array, target: jax.Array) -> jax.Array:
        return self._reduce((prediction - target) ** 2)


@dataclass(frozen=True)
class CrossEntropyLoss(Loss):
    """Softmax cross-entropy on logits (torch ``nn.CrossEntropyLoss``).

    ``prediction``: logits ``[N, C, *dims]``; ``target``: integer class indices
    ``[N, *dims]``. Reduction averages/sums over ``N * prod(dims)`` loss terms.

    ``ignore_index`` (default ``-100``, torch's) marks padded targets: they
    contribute zero loss and — like torch — the ``mean`` reduction divides by
    the number of NON-ignored targets. Any other out-of-range target is
    invalid (torch raises; under jit this class cannot, so operators validate
    targets eagerly during their determinism checks). NOTE for the sampled /
    TYPE2 Fisher paths: the mean-reduction scaling conventions count
    ``num_per_example_loss_terms`` loss terms per example — with ragged
    padding pass that number explicitly (the reference shares this static
    convention).
    """

    ignore_index: int = -100

    def __call__(self, prediction: jax.Array, target: jax.Array) -> jax.Array:
        logits = prediction
        if logits.ndim > 2:
            # [N, C, *dims] -> [N * prod(dims), C]
            moved = jnp.moveaxis(logits, 1, -1)
            logits = moved.reshape(-1, moved.shape[-1])
            target = target.reshape(-1)
        mask = target != self.ignore_index
        safe_t = jnp.where(mask, target, 0)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logprobs, safe_t[:, None].astype(jnp.int32), axis=-1
        )[:, 0]
        nll = jnp.where(mask, nll, 0.0)
        if self.reduction == "mean":
            count = jnp.maximum(jnp.sum(mask), 1)
            return jnp.sum(nll) / count
        return jnp.sum(nll)


@dataclass(frozen=True)
class BCEWithLogitsLoss(Loss):
    """Elementwise sigmoid binary cross-entropy (torch ``nn.BCEWithLogitsLoss``)."""

    def __call__(self, prediction: jax.Array, target: jax.Array) -> jax.Array:
        # numerically stable: max(x,0) - x*y + log(1 + exp(-|x|))
        x, y = prediction, target
        elementwise = (
            jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
        )
        return self._reduce(elementwise)


SUPPORTED_LOSSES = (MSELoss, CrossEntropyLoss, BCEWithLogitsLoss)
