"""Worked example: influence functions via inverse-curvature-vector products.

Influence functions (Koh & Liang 2017) estimate how up-weighting a training
example changes a test prediction's loss:

    influence(z_train, z_test) = - g(z_test)^T  H^{-1}  g(z_train)

Everything composes from operators this library already ships:

- ``H`` is the damped GGN (PSD, CG) or the raw Hessian (indefinite, MINRES);
- ``H^{-1} g(z_test)`` is ONE on-device Krylov solve (the whole loop is a
  single XLA program);
- the per-example gradient dot products come from the transposed-Jacobian
  machinery / plain per-example ``jax.grad``.

The reference's docs walk the same computation through its CG inverse; here
the indefinite variant is also available (MINRES needs no damping to be
well-posed).

Run: ``python examples/10_influence_functions.py``
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import curvlinops_tpu as cl


def main():
    key = jax.random.key(0)
    params = {
        "l0": {"W": 0.4 * jax.random.normal(key, (6, 24)), "b": jnp.zeros(24)},
        "l1": {"W": 0.4 * jax.random.normal(jax.random.key(1), (24, 3)),
               "b": jnp.zeros(3)},
    }

    def model_fn(p, x):
        h = jax.nn.tanh(x @ p["l0"]["W"] + p["l0"]["b"])
        return h @ p["l1"]["W"] + p["l1"]["b"]

    n_train = 48
    X = jax.random.normal(jax.random.key(2), (n_train, 6))
    y = jax.random.randint(jax.random.key(3), (n_train,), 0, 3)
    data = [(X, y)]
    loss_fn = cl.CrossEntropyLoss("mean")

    x_test = jax.random.normal(jax.random.key(4), (1, 6))
    y_test = jnp.asarray([1])

    def test_loss(p):
        return loss_fn(model_fn(p, x_test), y_test)

    g_test = jax.grad(test_loss)(params)

    # --- PSD route: damped GGN + CG --------------------------------------
    G = cl.GGNLinearOperator(model_fn, loss_fn, params, data)
    damped = G + 1e-3 * cl.IdentityLinearOperator(G.in_spec)
    ihvp_ggn = cl.CGInverseLinearOperator(damped, maxiter=400, tol=1e-8) @ g_test

    # --- indefinite route: raw Hessian + MINRES (no damping needed) ------
    H = cl.HessianLinearOperator(model_fn, loss_fn, params, data)
    ihvp_hess = cl.MINRESInverseLinearOperator(
        H + 1e-4 * cl.IdentityLinearOperator(H.in_spec),  # tiny shift only
        maxiter=600, tol=1e-8,
    ) @ g_test

    # --- per-example training gradients, one vmapped pass ----------------
    def example_grad(p, x_n, y_n):
        return jax.grad(
            lambda q: cl.CrossEntropyLoss("sum")(
                model_fn(q, x_n[None]), y_n[None]
            )
        )(p)

    grads = jax.vmap(lambda x_n, y_n: example_grad(params, x_n, y_n))(X, y)

    def dots(ihvp):
        flat_i = jnp.concatenate(
            [jnp.ravel(l) for l in jax.tree.leaves(ihvp)]
        )
        flat_g = jnp.concatenate(
            [l.reshape(n_train, -1) for l in jax.tree.leaves(grads)], axis=1
        )
        return -(flat_g @ flat_i)

    infl_ggn = np.asarray(dots(ihvp_ggn))
    infl_hess = np.asarray(dots(ihvp_hess))

    order = np.argsort(infl_ggn)
    print("most harmful train idxs (GGN):", order[:3].tolist())
    print("most helpful train idxs (GGN):", order[-3:].tolist())
    corr = np.corrcoef(infl_ggn, infl_hess)[0, 1]
    print(f"GGN-vs-Hessian influence rank agreement (corr): {corr:.3f}")
    # the two curvature choices must broadly agree on influence (seeded
    # run: 0.42), and the extremes must be distinct examples
    assert corr > 0.2, corr
    assert not set(order[:3].tolist()) & set(order[-3:].tolist())


if __name__ == "__main__":
    main()
