"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that every sharding / pjit path is
exercised without TPU hardware. Environment variables must be set before the
first ``import jax`` anywhere in the test process, which is why they live at
the top of conftest.
"""

import os
import sys

# Force CPU even when the environment pins JAX_PLATFORMS to a TPU platform —
# the test suite must run on the virtual 8-device mesh everywhere. Note: in
# some environments a sitecustomize imports jax at interpreter startup, so
# env vars alone are too late; jax.config.update works as long as no backend
# has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices()
