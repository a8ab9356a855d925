"""Test configuration: force an 8-device virtual CPU mesh.

The environment's sitecustomize registers the axon TPU backend and calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
overrides the JAX_PLATFORMS env var — so we must override the config again
here (conftest runs before any test touches a device) and set
xla_force_host_platform_device_count before the CPU client initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the process-wide compiled-executable accumulation: a full-suite
    run holds hundreds of jitted programs otherwise (an XLA CPU compile
    late in the suite has been seen to segfault under that state)."""
    yield
    jax.clear_caches()
