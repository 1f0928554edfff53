"""Test harness: force an 8-device virtual CPU mesh.

This is the standard way to exercise multi-device sharding (DP over a Mesh) without
real TPU hardware (SURVEY.md §4).  The axon sitecustomize in this image preimports
JAX and pins JAX_PLATFORMS=axon, so the env var alone is not enough — we must also
flip the jax config before the first backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cache compiles across pytest runs (verified effective in this environment)
_cache_dir = os.path.join(os.path.dirname(__file__), "..", "runs", ".jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
