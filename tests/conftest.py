"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4: multi-device tests
without a cluster via xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if axon TPU is configured
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax before conftest runs, so the env var
# alone is ignored; the config update still works because backends
# initialize lazily (first jax.devices() call happens in tests).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_config():
    """Restore config defaults around every test."""
    from dasac_tpu.core.config import reset_cfg

    reset_cfg()
    yield
    reset_cfg()
