"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing XLA to
expose 8 host devices (SURVEY.md §4 implication). jax may already be imported
by the interpreter's site hooks, so the platform is forced via
``jax.config.update`` (effective until the first backend use) rather than
environment variables alone.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) >= 8, "tests expect >=8 virtual CPU devices"


@pytest.fixture
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
