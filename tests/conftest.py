"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard way to test TPU SPMD code without TPU hardware: an
8-device host-platform mesh exercises the same sharding/collective paths
(`jax.sharding.Mesh` + pjit) that run on a real slice.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The environment may pin JAX_PLATFORMS to a hardware backend; tests always
# run on the virtual 8-device CPU mesh, so force it via the config API (which
# wins over the env var).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
