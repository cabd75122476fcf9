"""Worked example: scaling curvature computations over a device mesh.

No reference counterpart — curvlinops is single-device ("Multi-GPU support"
is listed under future ideas, reference ``README.md:71``). Here every
operator accepts ``mesh=``: batches shard over the mesh's data axis, the
per-batch curvature kernels run per-shard, and XLA's GSPMD inserts the
``psum`` over ICI at the accumulation points. The same results, bit-for-bit
up to float reduction order, on 1 or N devices.

Run (8 virtual CPU devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/09_mesh_scaleout.py
On real hardware the same code uses however many TPU chips are attached.
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import curvlinops_tpu as cl
from curvlinops_tpu.parallel import make_mesh, shard_params


def main():
    n_dev = jax.device_count()
    mesh = make_mesh(n_dev)
    print(f"{n_dev} device(s), mesh axes {mesh.axis_names}, "
          f"shape {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    key = jax.random.key(0)
    params = {
        "l0": {"W": 0.4 * jax.random.normal(key, (16, 64)), "b": jnp.zeros(64)},
        "l1": {"W": 0.4 * jax.random.normal(jax.random.key(1), (64, 8)),
               "b": jnp.zeros(8)},
    }

    def model_fn(p, x):
        h = jax.nn.relu(x @ p["l0"]["W"] + p["l0"]["b"])
        return h @ p["l1"]["W"] + p["l1"]["b"]

    # batch size must be divisible by the data-axis size
    N = 16 * n_dev
    X = jax.random.normal(jax.random.key(2), (N, 16))
    y = jax.random.randint(jax.random.key(3), (N,), 0, 8)
    data = [(X, y)]
    loss_fn = cl.CrossEntropyLoss("mean")

    # every operator takes mesh=: per-shard kernels + psum over the data axis
    single = cl.GGNLinearOperator(model_fn, loss_fn, params, data,
                                  check_deterministic=False)
    sharded = cl.GGNLinearOperator(model_fn, loss_fn, params, data,
                                   mesh=mesh, check_deterministic=False)
    v = np.random.default_rng(0).standard_normal(single.shape[0]).astype("f")
    err = np.abs(np.asarray(sharded @ v) - np.asarray(single @ v)).max()
    print(f"GGN matvec, sharded vs single-device: max |diff| = {err:.2e}")
    assert err < 1e-4, "mesh-sharded GGN deviates from single-device"

    # KFAC factor accumulation psums the per-shard covariances the same way
    kfac = cl.KFACLinearOperator(model_fn, loss_fn, params, data,
                                 fisher_type="type-2", mesh=mesh,
                                 check_deterministic=False)
    kfac_single = cl.KFACLinearOperator(model_fn, loss_fn, params, data,
                                        fisher_type="type-2",
                                        check_deterministic=False)
    err = np.abs(kfac.todense() - kfac_single.todense()).max()
    print(f"KFAC factors, sharded vs single-device: max |diff| = {err:.2e}")
    assert err < 1e-4, "mesh-sharded KFAC deviates from single-device"

    # large models: shard parameters over a second (model) axis
    if n_dev >= 4:
        n_even = (n_dev // 4) * 4  # even data x model grid, odd counts excluded
        mesh2 = make_mesh(n_even, axis_names=("data", "model"),
                          shape=(n_even // 2, 2))
        sharded_p = shard_params(params, mesh2, min_size=64)
        op = cl.GGNLinearOperator(model_fn, loss_fn, sharded_p, data,
                                  mesh=mesh2, check_deterministic=False)
        err = np.abs(np.asarray(op @ v) - np.asarray(single @ v)).max()
        print(f"2D (data x model) mesh GGN matvec:     max |diff| = {err:.2e}")
        assert err < 1e-4, "2D-mesh GGN deviates from single-device"


if __name__ == "__main__":
    main()
