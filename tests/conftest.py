"""Test harness: force an 8-device virtual CPU mesh.

All tests run on CPU with XLA's host-platform device-count override so
multi-chip sharding logic is exercised without TPU hardware (the strategy
SURVEY.md section 4 prescribes). Must run before jax initializes a backend.
"""

import os

# Force CPU even when the environment points JAX at a (tunneled) TPU.
# The axon PJRT plugin force-appends itself to jax_platforms regardless of
# the JAX_PLATFORMS env var, so the env var alone is not enough — the
# config.update below (before any backend is initialized) is what pins CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    "tests require the 8-device virtual CPU mesh; got "
    f"{jax.device_count()} {jax.default_backend()} devices"
)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)
