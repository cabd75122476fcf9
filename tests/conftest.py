"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device sharding paths are exercised without TPU hardware via
``--xla_force_host_platform_device_count`` (the analogue of the reference's
device-parametrized CUDA tests; see SURVEY.md §4).

Note: the environment pre-imports jax with ``JAX_PLATFORMS=axon`` (remote TPU
tunnel), so plain env vars are too late here — we must go through
``jax.config`` before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# persistent compile cache makes repeated suite runs much faster
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", "tests must run on CPU"
