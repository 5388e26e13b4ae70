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

# Must run before the first JAX backend initializes. Force CPU: the session
# env may point JAX_PLATFORMS at a remote TPU tunnel, which would send every
# tiny test op over TCP. A sitecustomize on PYTHONPATH can *import jax and
# register that TPU plugin at interpreter startup* — before this conftest
# runs — so setting os.environ alone is not enough: jax snapshots
# JAX_PLATFORMS into its config at import. jax.config.update() after the
# fact still wins because backends initialize lazily on first use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if "jax" in sys.modules:  # a sitecustomize beat us to the import
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
