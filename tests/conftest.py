"""Test configuration: force CPU backend with 8 virtual devices.

Unit tests run on the CPU backend so they work in CI without TPU hardware;
multi-chip sharding tests use the 8 virtual host devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the standard JAX
technique for testing pjit/shard_map layouts without a pod.

Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may force JAX_PLATFORMS=axon (TPU tunnel); config.update
# overrides it reliably where the env var does not.
jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 numerics against torch; keep matmuls full-precision.
jax.config.update("jax_default_matmul_precision", "highest")

import sys

# The reference repo's torch-only modules (sampling, codebook_pattern,
# backbone/_torch) serve as golden oracles for numerical parity tests.
REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
