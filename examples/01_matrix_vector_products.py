"""Worked example: curvature matrix-vector products.

Counterpart of the reference's ``example_matrix_vector_products.py``: build
Hessian/GGN/Fisher operators for a small MLP and verify them against dense
autodiff ground truths.

Run: ``python examples/01_matrix_vector_products.py``
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import curvlinops_tpu as cl
from curvlinops_tpu.examples import dense_ggn, dense_hessian


def main():
    key = jax.random.key(0)
    params = {
        "l0": {"W": 0.4 * jax.random.normal(key, (10, 16)), "b": jnp.zeros(16)},
        "l1": {"W": 0.4 * jax.random.normal(jax.random.key(1), (16, 3)),
               "b": jnp.zeros(3)},
    }

    def model_fn(p, x):
        h = jnp.tanh(x @ p["l0"]["W"] + p["l0"]["b"])
        return h @ p["l1"]["W"] + p["l1"]["b"]

    X = jax.random.normal(jax.random.key(2), (32, 10))
    y = jax.random.randint(jax.random.key(3), (32,), 0, 3)
    data = [(X[:16], y[:16]), (X[16:], y[16:])]
    loss_fn = cl.CrossEntropyLoss("mean")

    H = cl.HessianLinearOperator(model_fn, loss_fn, params, data)
    G = cl.GGNLinearOperator(model_fn, loss_fn, params, data)
    F_mc = cl.GGNLinearOperator(model_fn, loss_fn, params, data, mc_samples=8,
                                check_deterministic=False)
    F_emp = cl.EFLinearOperator(model_fn, loss_fn, params, data)

    D = H.shape[0]
    v = np.random.default_rng(0).standard_normal(D).astype(np.float32)

    print(f"parameter space dimension: {D}")
    print("||Hv|| =", np.linalg.norm(H @ v))
    print("||Gv|| =", np.linalg.norm(G @ v))
    print("||F_mc v|| =", np.linalg.norm(F_mc @ v))
    print("||F_emp v|| =", np.linalg.norm(F_emp @ v))

    # pytree in, pytree out
    v_tree = jax.tree.map(jnp.ones_like, params)
    Hv_tree = H @ v_tree
    print("pytree matvec leaves:", [leaf.shape for leaf in jax.tree.leaves(Hv_tree)])

    # verify against dense ground truths
    H_mat = dense_hessian(model_fn, loss_fn, params, data)
    G_mat = dense_ggn(model_fn, loss_fn, params, data)
    hessian_ok = np.allclose(H @ v, H_mat @ v, atol=1e-5)
    ggn_ok = np.allclose(G @ v, G_mat @ v, atol=1e-5)
    print("Hessian matches dense:", hessian_ok)
    print("GGN matches dense:    ", ggn_ok)
    assert hessian_ok and ggn_ok, "matvecs deviate from the dense oracles"

    # operator algebra: damped GGN
    damped = G + 1e-2 * cl.IdentityLinearOperator(G.in_spec)
    tr = float(cl.hutchinson_trace(damped, 64))
    print("damped GGN trace:", tr)
    tr_exact = float(np.trace(np.asarray(G_mat))) + 1e-2 * D
    assert abs(tr - tr_exact) / tr_exact < 0.25, (tr, tr_exact)


if __name__ == "__main__":
    main()
