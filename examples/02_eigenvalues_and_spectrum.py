"""Worked example: eigenvalues and spectral densities — fully on device.

Counterparts of the reference's ``example_eigenvalues.py`` and
``example_verification_spectral_density.py``, with LOBPCG / Lanczos replacing
the SciPy/ARPACK host escapes.

Run: ``python examples/02_eigenvalues_and_spectrum.py``
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
        "W1": 0.4 * jax.random.normal(key, (12, 24)),
        "W2": 0.4 * jax.random.normal(jax.random.key(1), (24, 5)),
    }
    model_fn = lambda p, x: jnp.tanh(x @ p["W1"]) @ p["W2"]  # noqa: E731
    X = jax.random.normal(jax.random.key(2), (64, 12))
    y = jax.random.normal(jax.random.key(3), (64, 5))

    G = cl.GGNLinearOperator(model_fn, cl.MSELoss("mean"), params, [(X, y)])
    damped = G + 1e-3 * cl.IdentityLinearOperator(G.in_spec)

    # top-k eigenpairs via LOBPCG (never leaves the device)
    evals, evecs = cl.topk_eigenpairs(damped, k=5, maxiter=200)
    print("top-5 eigenvalues:", np.asarray(evals).round(5))

    # full spectral density via Lanczos quadrature (Papyan 2020)
    grid, density = cl.lanczos_approximate_spectrum(
        damped, ncv=64, num_points=512, num_repeats=4
    )
    mass = float(jnp.trapezoid(density, grid))
    print("density integral:", mass)
    assert abs(mass - 1.0) < 0.05, f"spectral density mass {mass} != 1"

    # log-spectrum for many-decades spectra
    grid_log, density_log = cl.lanczos_approximate_log_spectrum(
        damped, ncv=64, num_points=512, num_repeats=4
    )
    print("log-density integral:", float(jnp.trapezoid(density_log, grid_log)))

    # cached variant amortizes Lanczos runs across hyperparameter sweeps
    cached = cl.LanczosApproximateSpectrumCached(damped, ncv=64)
    for kappa in (1.1, 3.0, 10.0):
        _, d = cached.approximate_spectrum(num_repeats=4, kappa=kappa)
        print(f"kappa={kappa}: peak density {float(d.max()):.4f}")

    # iterative spectral workloads pay the model's primal forward inside
    # EVERY matvec — hold the per-batch linearization on device instead
    # (same matrix, tangent-only matvecs; see curvature/held.py)
    held = G.linearized() + 1e-3 * cl.IdentityLinearOperator(G.in_spec)
    evals_held, _ = cl.topk_eigenpairs(held, k=5, maxiter=200)
    print("top-5 via held linearization:", np.asarray(evals_held).round(5))
    # held linearization computes the SAME matrix
    assert np.allclose(
        np.asarray(evals_held), np.asarray(evals), rtol=1e-3
    ), "held-linearization eigenvalues deviate from the direct operator's"


if __name__ == "__main__":
    main()
