"""Small library utilities.

Counterparts of the reference's ``curvlinops/utils.py`` helpers:
``allclose_report`` (``utils.py:173-215``) prints mismatching entries,
``make_functional_call`` (``utils.py:267-297``) adapts stateful module
libraries to the functional ``(params, X) -> prediction`` convention the
operators use (flax/haiku instead of ``nn.Module``), ``split_list``
(``utils.py:147``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

import numpy as np


@dataclass
class FrozenModelFn:
    """A model function with explicit frozen (non-differentiated) parameters.

    Closing a ``model_fn`` over large constant arrays embeds them into every
    jitted program's HLO (a classic JAX anti-pattern — for a 124M-parameter
    GPT the frozen embeddings alone are ~300 MB of constants per kernel).
    Wrapping them here lets every kernel-jitting site in the library pass the
    frozen pytree as a runtime ARGUMENT instead.

    ``fn`` has signature ``(frozen, params, X) -> prediction``; the object
    itself is callable as ``(params, X) -> prediction``.
    """

    fn: Callable
    frozen: Any

    def __call__(self, params: Any, X: Any):
        return self.fn(self.frozen, params, X)


def unwrap_model_fn(model_fn) -> tuple[Any, Callable]:
    """Split a model function into ``(frozen_pytree, fn(frozen, params, X))``."""
    if isinstance(model_fn, FrozenModelFn):
        return model_fn.frozen, model_fn.fn
    return (), lambda frozen, params, X: model_fn(params, X)


def allclose_report(
    a, b, rtol: float = 1e-5, atol: float = 1e-8, max_entries: int = 10
) -> bool:
    """Like ``np.allclose``, but print the mismatching entries on failure."""
    a, b = np.asarray(a), np.asarray(b)
    close = np.allclose(a, b, rtol=rtol, atol=atol)
    if not close:
        bad = ~np.isclose(a, b, rtol=rtol, atol=atol)
        for idx in np.argwhere(bad)[:max_entries]:
            key = tuple(int(i) for i in idx)
            print(f"  mismatch at {key}: {a[key]} vs {b[key]}")
        nonzero = int(bad.sum())
        print(f"  ... {nonzero}/{bad.size} entries differ")
    return bool(close)


def make_functional_call(module: Any, method: str | None = None) -> Callable:
    """Adapt a flax/haiku module to the ``(params, X) -> prediction`` convention.

    - flax ``linen.Module``: wraps ``module.apply({'params': params}, X)``.
    - haiku ``Transformed`` (from ``hk.transform``): wraps ``.apply(params, None, X)``.
    - plain callables pass through.

    Args:
        module: The model object.
        method: Optional flax method name.

    Returns:
        Functional forward pass ``(params, X) -> prediction``.

    Raises:
        ValueError: If the object cannot be adapted.
    """
    apply = getattr(module, "apply", None)
    if apply is not None and hasattr(module, "init"):
        # flax linen or haiku transformed; distinguish by class ancestry
        mro_modules = [c.__module__ for c in type(module).__mro__]
        if any("flax" in m for m in mro_modules):

            def model_fn(params, X):
                kwargs = {"method": method} if method else {}
                return module.apply({"params": params}, X, **kwargs)

            return model_fn
        if any("haiku" in m for m in mro_modules) or "transform" in type(
            module
        ).__name__.lower():

            def model_fn(params, X):
                return module.apply(params, None, X)

            return model_fn
    if callable(module):
        return module
    raise ValueError(
        f"Cannot adapt {type(module).__name__} to (params, X) -> prediction; "
        "pass a flax module, a haiku Transformed, or a plain callable."
    )


def split_list(xs: Sequence, sizes: Sequence[int]) -> list:
    """Split a sequence into consecutive chunks of the given sizes.

    Raises:
        ValueError: If the sizes do not sum to the sequence length.
    """
    if sum(sizes) != len(xs):
        raise ValueError(f"sizes {sizes} do not sum to len {len(xs)}.")
    out, start = [], 0
    for size in sizes:
        out.append(list(xs[start : start + size]))
        start += size
    return out
