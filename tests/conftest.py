"""Test harness config.

Tests run on CPU with 8 virtual XLA devices (so shard_map/mesh logic is
exercised without TPU hardware — the strategy called for in SURVEY.md §4)
and with float64 enabled, because parity gates against the NumPy oracle are
evaluated at 1e-6 rtol like the reference's float64 LAPACK path.
"""

import os

# The ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests
# run on CPU so float64 parity holds and virtual multi-device meshes work.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize registers the axon TPU plugin and sets jax_platforms to
# "axon,cpu" regardless of the env var; force it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
