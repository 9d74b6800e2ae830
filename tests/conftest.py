"""Test configuration: run everything on a virtual 8-device CPU mesh.

Env vars alone are NOT enough on this container: a ``sitecustomize`` hook
imports jax at *interpreter start* (to register the remote-TPU "axon"
plugin), so ``JAX_PLATFORMS``/``XLA_FLAGS`` have already been read by the
time conftest executes — mutating ``os.environ`` here is a silent no-op and
the suite would run on the single tunnel TPU (or one CPU device). The
config API still works until a backend actually initializes, so force the
platform and the 8-device CPU host through it.
"""

import os

# belt-and-braces for environments without the early-import hook
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the heavier jitted programs (method train steps
# in test_learning.py, the sharded eval) compile once per code change and
# replay from cache on repeat suite runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tllod_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(3)  # reference RNG_SEED=3 (config.py:262)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy-compile tests (method train steps, learning/golden "
        "runs); `pytest -m 'not slow'` is the quick tier — see README")
