"""Test harness: run everything on a virtual 8-device CPU mesh.

TPU chips are not available in CI; CPU JAX devices stand in for them
(multi-chip sharding tests exercise the same `shard_map`/collective code
paths XLA would emit over ICI). Must set env vars before jax is imported
anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU tunnel plugin in this image ignores the JAX_PLATFORMS env var, so
# force CPU through the config API before any device is touched.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
