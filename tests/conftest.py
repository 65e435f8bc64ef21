"""Test harness config: force JAX onto a virtual 8-device CPU mesh so all
sharding/multi-chip logic is exercised without TPU hardware (the driver
validates the real multi-chip path separately via __graft_entry__)."""

import os

# Must run before `import jax` anywhere in the test session.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms='axon,cpu' at interpreter start, overriding JAX_PLATFORMS.
# Re-force CPU before any backend initialization so tests run on the
# 8-device virtual CPU mesh (and don't remote-compile through the TPU relay).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _reference_available():
    return os.path.isdir("/root/reference/modules")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference_parity: needs the read-only reference mount")
