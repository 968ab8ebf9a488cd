"""Test configuration: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 build implication).

Must run before jax initializes its backend, hence env mutation at import time."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env sets axon (TPU tunnel); tests run on CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone does not reliably override the preinstalled axon TPU plugin;
# the config update does.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
