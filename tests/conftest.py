"""Test configuration.

The clean CPU environment (axon stripped, JAX_PLATFORMS=cpu, 8 virtual
devices, f32 matmul precision) is established by the ``fastdet_test_boot``
plugin (see pyproject addopts), which re-execs pytest before jax can be
touched. This conftest only wires up paths and shared fixtures.
"""

import os
import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest


@pytest.fixture(scope="session")
def cpu_devices():
    """The 8 virtual CPU devices (skips if the boot plugin didn't run)."""
    import jax

    devs = jax.devices()
    if len(devs) < 8 or devs[0].platform != "cpu":
        pytest.skip("virtual 8-device CPU mesh unavailable")
    return devs
