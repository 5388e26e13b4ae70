"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-device sharding tests run against 8 virtual CPU devices
(``xla_force_host_platform_device_count``), mirroring how the driver
validates the multi-chip path without real chips.
"""

import os
import sys

# Repo root importable regardless of the invoking cwd.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# Must be set before jax is imported anywhere. Force CPU: the session env may
# point JAX_PLATFORMS at the remote TPU tunnel, which would send every tiny
# test op over TCP.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
