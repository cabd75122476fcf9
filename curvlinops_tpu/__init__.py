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
from curvlinops_tpu.curvature.ggn_diagonal import GGNDiagonalLinearOperator
from curvlinops_tpu.curvature.hessian import HessianLinearOperator
from curvlinops_tpu.curvature.jacobian import (
    JacobianLinearOperator,
    TransposedJacobianLinearOperator,
)
from curvlinops_tpu.curvature.loss_hessian import FisherType, KFACType
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
    NeumannInverseLinearOperator,
)
from curvlinops_tpu.ops.kronecker import KroneckerProductLinearOperator
from curvlinops_tpu.ops.submatrix import SubmatrixLinearOperator

__version__ = "0.1.0"

__all__ = [
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
    "NeumannInverseLinearOperator",
    "HessianLinearOperator",
    "GGNLinearOperator",
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
]
