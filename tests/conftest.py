"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

The reference is float64 end-to-end (Spatial_GP_repo/utils.py:31-33); parity
tests run in f64 on CPU.  Sharding tests use the 8 virtual devices.  TPU runs
use f32 (exercised by bench.py / __graft_entry__.py, not by this suite).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel
# ('axon'), which has no float64 support and a slow first-compile; the parity
# suite needs f64 and the 8 virtual devices below.  A sitecustomize hook
# registers the axon PJRT plugin at interpreter start and rewrites
# JAX_PLATFORMS, so the env var alone is not enough — we also override the
# jax config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
