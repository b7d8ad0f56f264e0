"""Test environment: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY §4d: the jax-native
answer to testing multi-chip sharding without a cluster).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Site customization on some hosts force-registers an accelerator platform
# after env vars are read; override at the config level too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
