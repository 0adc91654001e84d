"""Test configuration: force an 8-virtual-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware
(the standard JAX substitute for a real mesh, see SURVEY.md §4).

The env-var route (JAX_PLATFORMS=cpu) is not enough here: a TPU
plugin registered from sitecustomize can override it, so the platform
is also forced through jax.config before any backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
