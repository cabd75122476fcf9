"""Generate ``docs/API.md`` from the public API's signatures + docstrings.

Usage::

    python tools/gen_api_docs.py

The page is the flat-file counterpart of the reference's RTD API docs
(``docs/api/``): every name in ``curvlinops_tpu.__all__``, grouped by
subsystem, with its signature and docstring summary. A test
(``tests/test_api_docs.py``) keeps the page from going stale by checking
every public symbol appears.
"""

from __future__ import annotations

import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import curvlinops_tpu as cl  # noqa: E402
import curvlinops_tpu.examples  # noqa: E402,F401
import curvlinops_tpu.models  # noqa: E402,F401

GROUPS = [
    (
        "Curvature operators",
        "Matrix-free operators over the empirical risk: construct from "
        "`(model_fn, loss_fn, params, data)`; matvecs accept/return "
        "parameter pytrees, flat `[N]`/`[N, K]` jax or numpy arrays.",
        [
            "HessianLinearOperator",
            "GGNLinearOperator",
            "EFLinearOperator",
            "GGNDiagonalLinearOperator",
            "JacobianLinearOperator",
            "TransposedJacobianLinearOperator",
            "KFACLinearOperator",
            "EKFACLinearOperator",
            "KFOCLinearOperator",
        ],
    ),
    (
        "Structured operators",
        None,
        [
            "LinearOperator",
            "PytreeLinearOperator",
            "SumLinearOperator",
            "ScaledLinearOperator",
            "ChainLinearOperator",
            "HeldLinearizationOperator",
            "DiagonalLinearOperator",
            "BlockDiagonalLinearOperator",
            "KroneckerProductLinearOperator",
            "EighDecomposedLinearOperator",
            "SubmatrixLinearOperator",
            "MatrixLinearOperator",
            "IdentityLinearOperator",
            "OuterProductLinearOperator",
        ],
    ),
    (
        "Inverses",
        None,
        [
            "CGInverseLinearOperator",
            "LSMRInverseLinearOperator",
            "MINRESInverseLinearOperator",
            "NeumannInverseLinearOperator",
        ],
    ),
    (
        "Losses",
        "Torch-identical numerics (`mean`/`sum` reductions).",
        ["MSELoss", "CrossEntropyLoss", "BCEWithLogitsLoss"],
    ),
    (
        "Estimators",
        "Matrix-free estimation: trace, diagonal, norm, and matrix-function "
        "traces.",
        [
            "hutchinson_trace",
            "hutchpp_trace",
            "xtrace",
            "hutchinson_diag",
            "xdiag",
            "hutchinson_squared_fro",
            "slq_function_trace",
            "slq_logdet",
        ],
    ),
    (
        "Spectral",
        "On-device Lanczos/LOBPCG: spectra, densities, extremal eigenpairs.",
        [
            "lanczos_approximate_spectrum",
            "lanczos_approximate_log_spectrum",
            "LanczosApproximateSpectrumCached",
            "LanczosApproximateLogSpectrumCached",
            "topk_eigenpairs",
            "lanczos_eigsh",
        ],
    ),
    (
        "Configuration enums",
        None,
        ["FisherType", "KFACType"],
    ),
    (
        "Parallelism",
        "Device-mesh scale-out: every operator/computer takes `mesh=`.",
        ["make_mesh", "shard_params", "prefetch_to_device",
         "PrefetchToDevice"],
    ),
    (
        "Functional-model utilities",
        None,
        ["make_functional_call", "FrozenModelFn"],
    ),
    (
        "Verification helpers",
        "Dense autodiff ground truths for tests and small problems "
        "(`curvlinops_tpu.examples`).",
        [
            "examples.dense_hessian",
            "examples.dense_ggn",
            "examples.dense_empirical_fisher",
            "examples.dense_jacobian",
        ],
    ),
    (
        "Model zoo",
        "Benchmark problems (`curvlinops_tpu.models`): construct a "
        "`Problem` with model/loss/params/data and a KFAC-restricted view.",
        [
            "models.mnist_mlp",
            "models.cifar10_resnet18",
            "models.imagenet_resnet50",
            "models.shakespeare_nanogpt",
            "models.cifar10_vit",
        ],
    ),
]


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _summary(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    para = doc.split("\n\n")[0].replace("\n", " ").strip()
    return para


def _resolve(name: str):
    obj = cl
    for part in name.split("."):
        obj = getattr(obj, part)
    return obj


def _entry(name: str) -> str:
    obj = _resolve(name)
    if inspect.isclass(obj):
        init = obj.__init__
        sig = _signature(init).replace("(self, ", "(").replace("(self)", "()")
        head = f"### `{name}{sig}`"
        lines = [head, "", _summary(obj)]
        # public methods beyond the LinearOperator protocol
        base = cl.LinearOperator if name != "LinearOperator" else object
        for mname, meth in sorted(vars(obj).items()):
            if mname.startswith("_") or not callable(meth):
                continue
            if hasattr(base, mname):
                continue
            msum = _summary(meth)
            if msum:
                lines.append(f"- `.{mname}{_signature(meth)}` — {msum}")
        return "\n".join(lines)
    return f"### `{name}{_signature(obj)}`\n\n{_summary(obj)}"


def main() -> None:
    grouped = {n for _, _, names in GROUPS for n in names}
    missing = [n for n in cl.__all__ if n not in grouped]
    if missing:
        sys.exit(f"Ungrouped public symbols (add to GROUPS): {missing}")

    out = [
        "# API reference",
        "",
        "Generated by `python tools/gen_api_docs.py` from the public "
        "docstrings — regenerate after changing them. See `MIGRATION.md` "
        "for the reference-API mapping, `examples/` for tutorials, and "
        "`docs/PLAYBOOK.md` for the large-model inversion recipes "
        "(exact / Cholesky / rank-r / mesh, with measured costs).",
    ]
    for title, blurb, names in GROUPS:
        out += ["", f"## {title}", ""]
        if blurb:
            out += [blurb, ""]
        for n in names:
            out += [_entry(n), ""]
    Path(__file__).resolve().parent.parent.joinpath("docs").mkdir(exist_ok=True)
    path = Path(__file__).resolve().parent.parent / "docs" / "API.md"
    path.write_text("\n".join(out).rstrip() + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
