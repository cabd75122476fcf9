"""Worked example: submatrices, trace/diagonal estimation, Frobenius norms.

Counterparts of the reference's ``example_submatrices.py`` and
``example_trace_diagonal_estimation.py``: slice a curvature operator
matrix-free, and estimate its trace/diagonal/norm with Hutchinson-family
methods at a fraction of the exact cost.

Run: ``python examples/05_submatrices_and_estimation.py``
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
        "l0": {"W": 0.4 * jax.random.normal(key, (10, 24)), "b": jnp.zeros(24)},
        "l1": {"W": 0.4 * jax.random.normal(jax.random.key(1), (24, 5)),
               "b": jnp.zeros(5)},
    }

    def model_fn(p, x):
        h = jnp.tanh(x @ p["l0"]["W"] + p["l0"]["b"])
        return h @ p["l1"]["W"] + p["l1"]["b"]

    X = jax.random.normal(jax.random.key(2), (64, 10))
    y = jax.random.normal(jax.random.key(3), (64, 5))
    G = cl.GGNLinearOperator(model_fn, cl.MSELoss("mean"), params, [(X, y)])
    damped = G + 1e-2 * cl.IdentityLinearOperator(G.in_spec)
    D = damped.shape[0]
    print(f"operator: {damped.shape}")

    # --- submatrices: the first layer's weight block, matrix-free ---------
    # flat parameter order follows the pytree leaves: l0.b, l0.W, l1.b, l1.W
    w0_start, w0_stop = 24, 24 + 240
    idxs = list(range(w0_start, w0_stop))
    block = cl.SubmatrixLinearOperator(damped, idxs, idxs)
    print("W0 diagonal block:", block.shape)
    print("  block trace (exact, via estimator on the slice):",
          float(cl.hutchinson_trace(block, 100, key=jax.random.key(4))))

    # --- trace estimation: Hutchinson vs Hutch++ vs XTrace ----------------
    exact_trace = float(np.trace(np.asarray(damped.todense())))
    for name, fn in [("hutchinson", cl.hutchinson_trace),
                     ("hutch++", cl.hutchpp_trace),
                     ("xtrace", cl.xtrace)]:
        matvecs = 60 if name != "hutch++" else 60
        est = float(fn(damped, matvecs, key=jax.random.key(5)))
        rel = abs(est - exact_trace) / exact_trace
        print(f"  {name:10s} ({matvecs} matvecs): {est:9.4f} "
              f"(exact {exact_trace:.4f}, rel err {rel:.1%})")
        assert rel < 0.10, (name, est, exact_trace)

    # --- diagonal and squared Frobenius norm ------------------------------
    diag_est = cl.xdiag(damped, 120, key=jax.random.key(6))
    diag_true = np.diag(np.asarray(damped.todense()))
    print("  xdiag max abs err:", float(np.abs(np.asarray(diag_est) - diag_true).max()))
    fro2 = float(cl.hutchinson_squared_fro(damped, 60, key=jax.random.key(7)))
    print("  ||A||_F^2 estimate:", fro2,
          " exact:", float(np.linalg.norm(np.asarray(damped.todense())) ** 2))

    # --- matrix functions: logdet / tr(A^-1) via Lanczos quadrature -------
    # one jitted program for all probes; no dense factorization
    ld = float(cl.slq_logdet(damped, ncv=64, num_repeats=32,
                             key=jax.random.key(8)))
    ld_true = float(np.linalg.slogdet(np.asarray(damped.todense()))[1])
    print(f"  slq_logdet: {ld:.4f} (exact {ld_true:.4f})")
    assert abs(ld - ld_true) / abs(ld_true) < 0.02, (ld, ld_true)
    tr_inv = float(cl.slq_function_trace(damped, lambda t: 1.0 / t, ncv=64,
                                         num_repeats=32,
                                         key=jax.random.key(9)))
    tr_inv_true = float(np.trace(np.linalg.inv(np.asarray(damped.todense()))))
    print(f"  slq tr(A^-1): {tr_inv:.4f} (exact {tr_inv_true:.4f})")
    assert abs(tr_inv - tr_inv_true) / tr_inv_true < 0.05, (tr_inv, tr_inv_true)


if __name__ == "__main__":
    main()
