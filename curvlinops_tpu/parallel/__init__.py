"""Device-mesh data/model parallelism helpers (no reference counterpart).

The reference is single-device (``README.md:18``; multi-GPU is a "future
idea", ``README.md:71``); here every operator accepts ``mesh=`` and shards
its per-batch kernels over the mesh's data axis via GSPMD.
"""

from curvlinops_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_params"]
