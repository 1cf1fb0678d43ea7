"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU validation happens via bench.py and the driver's graft entry; unit
tests must be hermetic and fast, so we force the CPU backend with 8 virtual
devices to exercise the multi-chip sharding paths.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may pre-select an accelerator platform (e.g. the axon TPU
# tunnel) before our env var is seen; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x9A9)
