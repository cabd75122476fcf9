"""curvlinops_tpu — TPU-native curvature linear operators for JAX.

A brand-new JAX/XLA/Pallas framework with the capabilities of
`f-dangel/curvlinops`: deep-learning curvature matrices (Hessian, GGN,
Monte-Carlo/type-2/empirical Fisher, KFAC, EKFAC, KFOC, Jacobians) as
matrix-free linear operators over parameter pytrees, plus operator algebra,
damped inversion, randomized trace/diagonal/norm estimators, and Lanczos
spectral densities — all pure jitted functions that scale over device meshes.
"""

from curvlinops_tpu.curvature.ef import EFLinearOperator
from curvlinops_tpu.curvature.ggn import GGNLinearOperator
from curvlinops_tpu.curvature.held import HeldLinearizationOperator
from curvlinops_tpu.curvature.ggn_diagonal import GGNDiagonalLinearOperator
from curvlinops_tpu.curvature.hessian import HessianLinearOperator
from curvlinops_tpu.curvature.jacobian import (
    JacobianLinearOperator,
    TransposedJacobianLinearOperator,
)
from curvlinops_tpu.curvature.loss_hessian import FisherType, KFACType
from curvlinops_tpu import parallel
from curvlinops_tpu.parallel import make_mesh, shard_params
from curvlinops_tpu.estimators.diagonal import hutchinson_diag, xdiag
from curvlinops_tpu.estimators.norm import hutchinson_squared_fro
from curvlinops_tpu.estimators.slq import slq_function_trace, slq_logdet
from curvlinops_tpu.estimators.trace import hutchinson_trace, hutchpp_trace, xtrace
from curvlinops_tpu.solvers.eigsh import topk_eigenpairs
from curvlinops_tpu.utils.misc import FrozenModelFn, make_functional_call
from curvlinops_tpu.utils.prefetch import PrefetchToDevice, prefetch_to_device
from curvlinops_tpu.solvers.lanczos import (
    LanczosApproximateLogSpectrumCached,
    LanczosApproximateSpectrumCached,
    lanczos_approximate_log_spectrum,
    lanczos_approximate_spectrum,
    lanczos_eigsh,
)
from curvlinops_tpu.kfac.ekfac import EKFACLinearOperator
from curvlinops_tpu.kfac.kfoc import KFOCLinearOperator
from curvlinops_tpu.kfac.operator import KFACLinearOperator
from curvlinops_tpu.losses import BCEWithLogitsLoss, CrossEntropyLoss, MSELoss
from curvlinops_tpu.ops.base import (
    ChainLinearOperator,
    LinearOperator,
    PytreeLinearOperator,
    ScaledLinearOperator,
    SumLinearOperator,
)
from curvlinops_tpu.ops.blockdiag import BlockDiagonalLinearOperator
from curvlinops_tpu.ops.dense import (
    IdentityLinearOperator,
    MatrixLinearOperator,
    OuterProductLinearOperator,
)
from curvlinops_tpu.ops.diagonal import DiagonalLinearOperator
from curvlinops_tpu.ops.eigh import EighDecomposedLinearOperator
from curvlinops_tpu.ops.inverse import (
    CGInverseLinearOperator,
    LSMRInverseLinearOperator,
    MINRESInverseLinearOperator,
    NeumannInverseLinearOperator,
)
from curvlinops_tpu.ops.kronecker import KroneckerProductLinearOperator
from curvlinops_tpu.ops.submatrix import SubmatrixLinearOperator

__version__ = "0.1.0"

__all__ = [
    "PrefetchToDevice",
    "prefetch_to_device",
    "make_mesh",
    "shard_params",
    "LinearOperator",
    "PytreeLinearOperator",
    "SumLinearOperator",
    "ScaledLinearOperator",
    "ChainLinearOperator",
    "MatrixLinearOperator",
    "IdentityLinearOperator",
    "OuterProductLinearOperator",
    "DiagonalLinearOperator",
    "BlockDiagonalLinearOperator",
    "KroneckerProductLinearOperator",
    "EighDecomposedLinearOperator",
    "SubmatrixLinearOperator",
    "CGInverseLinearOperator",
    "LSMRInverseLinearOperator",
    "MINRESInverseLinearOperator",
    "NeumannInverseLinearOperator",
    "HessianLinearOperator",
    "GGNLinearOperator",
    "HeldLinearizationOperator",
    "EFLinearOperator",
    "GGNDiagonalLinearOperator",
    "JacobianLinearOperator",
    "TransposedJacobianLinearOperator",
    "KFACLinearOperator",
    "EKFACLinearOperator",
    "KFOCLinearOperator",
    "FisherType",
    "KFACType",
    "MSELoss",
    "CrossEntropyLoss",
    "BCEWithLogitsLoss",
    # spectral properties
    "lanczos_approximate_spectrum",
    "lanczos_approximate_log_spectrum",
    "lanczos_eigsh",
    "LanczosApproximateSpectrumCached",
    "LanczosApproximateLogSpectrumCached",
    "topk_eigenpairs",
    # trace estimation
    "hutchinson_trace",
    "hutchpp_trace",
    "xtrace",
    # diagonal estimation
    "hutchinson_diag",
    "xdiag",
    # norm estimation
    "hutchinson_squared_fro",
    "slq_function_trace",
    "slq_logdet",
    # adapters
    "make_functional_call",
    "FrozenModelFn",
]
