"""Worked example: Monte-Carlo approximation of the Fisher.

Counterpart of the reference's ``example_fisher_monte_carlo.py``
(``docs/examples/basic_usage/example_fisher_monte_carlo.py``): for common
losses the Fisher equals the GGN, and the gradient-outer-product form with
labels SAMPLED from the model's likelihood converges to it as the number of
Monte-Carlo samples grows. Here both are matrix-free operators; we
materialize them on a small classifier and watch the relative Frobenius
error fall at the expected ``1/sqrt(M)`` rate.

Run: ``python examples/08_monte_carlo_fisher.py``
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
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "l0": {"W": 0.5 * jax.random.normal(k1, (6, 16)), "b": jnp.zeros(16)},
        "l1": {"W": 0.5 * jax.random.normal(k2, (16, 3)), "b": jnp.zeros(3)},
    }

    def model_fn(p, x):
        h = jax.nn.sigmoid(x @ p["l0"]["W"] + p["l0"]["b"])
        return h @ p["l1"]["W"] + p["l1"]["b"]

    X = jax.random.normal(k3, (32, 6))
    y = jax.random.randint(k4, (32,), 0, 3)
    data = [(X, y)]
    loss_fn = cl.CrossEntropyLoss("mean")

    dim = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    identity = np.eye(dim, dtype=np.float32)

    # Fisher = GGN for CE/MSE/BCE: the exact reference
    ggn = cl.GGNLinearOperator(model_fn, loss_fn, params, data) @ identity
    ggn_norm = np.linalg.norm(ggn)

    print(" M (MC samples) | ||F_MC - GGN||_F / ||GGN||_F")
    print("----------------+------------------------------")
    errors = {}
    for mc_samples in (1, 4, 16, 64, 256):
        fisher = cl.GGNLinearOperator(
            model_fn, loss_fn, params, data,
            mc_samples=mc_samples, seed=42, check_deterministic=False,
        ) @ identity
        errors[mc_samples] = np.linalg.norm(fisher - ggn) / ggn_norm
        print(f"{mc_samples:15d} | {errors[mc_samples]:.4f}")

    # the error should shrink roughly like 1/sqrt(M)
    rate = np.log(errors[256] / errors[1]) / np.log(256)
    print(f"observed convergence rate: M^{rate:.2f}  (expected ~ M^-0.5)")
    assert rate < -0.35, f"MC-Fisher not converging to the GGN: rate M^{rate:.2f}"

    # the empirical Fisher (outer product of TRUE-label gradients) is a
    # different matrix — it does not converge to the GGN
    ef = cl.EFLinearOperator(model_fn, loss_fn, params, data) @ identity
    ef_dist = float(np.linalg.norm(ef - ggn) / ggn_norm)
    print("empirical Fisher distance:", round(ef_dist, 4), "(does not vanish)")
    assert ef_dist > 5 * errors[256], (
        "the empirical Fisher should stay far from the GGN while MC converges"
    )


if __name__ == "__main__":
    main()
