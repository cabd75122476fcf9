"""float64 end-to-end support (reference users verify in double precision).

The reference inherits float64 from torch transparently
(``/root/reference/curvlinops/_torch_base.py`` never casts); here the
equivalent contract is that the whole stack — curvature matvecs, KFAC/EKFAC
builds, exact-damped inversion, estimators — runs under
``jax_enable_x64`` and RETURNS float64 (no silent f32 bottleneck).

``jax_enable_x64`` is process-global, so the drive runs in a fresh
interpreter (everything else in the suite assumes default f32).
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import curvlinops_tpu as cl
from curvlinops_tpu.utils.flatten import spec_of, make_ravel_unravel

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
params = {{
    "W1": jax.random.normal(k1, (8, 16), jnp.float64) * 0.3,
    "b1": jnp.zeros(16, jnp.float64),
    "W2": jax.random.normal(k2, (16, 4), jnp.float64) * 0.3,
    "b2": jnp.zeros(4, jnp.float64),
}}
X = jax.random.normal(k3, (12, 8), jnp.float64)
y = jax.random.randint(jax.random.PRNGKey(9), (12,), 0, 4)


def model_fn(p, x):
    return jnp.tanh(x @ p["W1"] + p["b1"]) @ p["W2"] + p["b2"]


loss_fn = cl.losses.CrossEntropyLoss(reduction="mean")
data = [(X, y)]

H = cl.HessianLinearOperator(model_fn, loss_fn, params, data)
ravel, unravel = make_ravel_unravel(spec_of(params))
flat = ravel(params)


def flat_loss(f):
    return loss_fn(model_fn(unravel(f), X), y)


Hd = np.asarray(jax.hessian(flat_loss)(flat))
v = np.random.RandomState(0).randn(H.shape[1])
hv = H @ v
assert hv.dtype == np.float64, hv.dtype
# float64 accuracy, not float32-computed-then-cast: 1e-12 only holds if the
# whole matvec ran in double precision
err = np.abs(hv - Hd @ v).max() / max(1.0, np.abs(Hd @ v).max())
assert err < 1e-12, f"x64 Hessian matvec only f32-accurate: {{err}}"

K = cl.KFACLinearOperator(
    model_fn, loss_fn, params, data, fisher_type=cl.FisherType.TYPE2
)
kv = K @ v
assert kv.dtype == np.float64
Ki = K.inverse(damping=1e-3, use_exact_damping=True)
assert (Ki @ v).dtype == np.float64

E = cl.EKFACLinearOperator(
    model_fn, loss_fn, params, data, fisher_type=cl.FisherType.TYPE2
)
assert (E @ v).dtype == np.float64

# Hutch++ is exact (to roundoff) when the sketch captures the whole range;
# the GGN here has rank <= B*C = 48, so 3*60 matvecs (sketch 120) suffice —
# and 1e-10 relative only holds if the estimator itself ran in float64.
from curvlinops_tpu.examples import dense_ggn

G = cl.GGNLinearOperator(model_fn, loss_fn, params, data)
t_true = float(np.trace(dense_ggn(model_fn, loss_fn, params, data)))
t_est = cl.hutchpp_trace(G, 180)
assert abs(t_est - t_true) < 1e-10 * max(1.0, abs(t_true)), (t_est, t_true)
print("X64-DRIVE-PASSED")
"""


def test_x64_end_to_end():
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "X64-DRIVE-PASSED" in r.stdout
