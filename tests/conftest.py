"""Test configuration: force a virtual 8-device CPU mesh and f64 support.

Multi-chip sharding is validated on a host-platform device mesh (no real
multi-chip TPU hardware in CI); golden numerics tests run in f64 on CPU
against the reference formulas.

Note: the environment pins JAX_PLATFORMS to the TPU plugin via
sitecustomize, so the env var alone cannot select CPU — the config update
after import is what takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
