"""Library utilities: pytree flattening, diff reporting, module adapters."""

from curvlinops_tpu.utils.flatten import (
    make_ravel_unravel,
    make_ravel_unravel_cols,
    spec_dtype,
    spec_of,
    spec_size,
    tree_add,
    tree_conj,
    tree_randn_like,
    tree_scale,
    tree_sub,
    tree_vdot,
    zeros_like_spec,
)
from curvlinops_tpu.utils.misc import (
    allclose_report,
    make_functional_call,
    split_list,
)
from curvlinops_tpu.utils.prefetch import PrefetchToDevice, prefetch_to_device

__all__ = [
    "spec_of",
    "spec_size",
    "spec_dtype",
    "zeros_like_spec",
    "make_ravel_unravel",
    "make_ravel_unravel_cols",
    "tree_add",
    "tree_sub",
    "tree_scale",
    "tree_vdot",
    "tree_conj",
    "tree_randn_like",
    "allclose_report",
    "make_functional_call",
    "split_list",
    "PrefetchToDevice",
    "prefetch_to_device",
]
