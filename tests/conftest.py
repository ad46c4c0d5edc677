"""Test configuration: force CPU with 8 virtual devices so sharding tests
exercise a real multi-device mesh without TPU hardware (SURVEY §4 /
§7.6 distributed-test strategy).

Note: this image's axon TPU plugin overrides JAX_PLATFORMS at interpreter
start via sitecustomize, so the env var alone is not enough — we must also
set the config programmatically after importing jax.
"""

import os

# STARST3R_TEST_TPU=1 keeps the real TPU backend so the hardware-gated
# tests (compiled-mode Pallas parity, 512px GA memory) actually run —
# they are no-ops under the default CPU forcing below.
_USE_TPU = os.environ.get("STARST3R_TEST_TPU", "") == "1"

# Must be set before jax initializes any backend.
flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

from starst3r_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
