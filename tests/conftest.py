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


@pytest.fixture(scope="session")
def native_ready():
    """The native JPEG module, built on demand.

    ONE build-or-skip fixture for every module (five copies previously
    diverged: some skipped without trying `make`, so a fresh checkout
    silently dropped the sparse/planes ingest coverage when those
    modules ran in isolation).
    """
    import subprocess

    from fastdet_tpu.runtime import native_jpeg

    if not native_jpeg.available():
        subprocess.run(
            ["make", "-C", str(REPO_ROOT / "native" / "jpeg")],
            capture_output=True,
        )
        if not native_jpeg.available():
            pytest.skip("native jpeg library unavailable (build failed)")
    return native_jpeg


@pytest.fixture(autouse=True, scope="session")
def _single_device_default_engines():
    """Engines built WITHOUT an explicit devices list run single-device
    under pytest. The bare default would grab all 8 virtual CPU devices
    and compile dp-8 GSPMD programs for dozens of tests that aren't
    about data parallelism at all — measured as a large multiple of the
    quick tier's compile time (VERDICT r2 #7). Multi-chip coverage is
    explicit: test_engine_multichip / the dp serving stress test pass
    devices=cpu_devices."""
    import jax

    from fastdet_tpu.runtime import engine as engine_mod

    orig = engine_mod.DetectionEngine.__init__

    def patched(self, spec, params, **kw):
        if kw.get("devices") is None:
            kw["devices"] = jax.devices()[:1]
        return orig(self, spec, params, **kw)

    engine_mod.DetectionEngine.__init__ = patched
    yield
    engine_mod.DetectionEngine.__init__ = orig


@pytest.fixture(scope="session")
def tiny_f32_engine():
    """Shared synthetic:tiny f32 engine, buckets (1, 2) — the standard
    test engine, previously compiled separately by four modules on the
    1-core host. Tests asserting TIER ROUTING must clear _tier_hint
    first (they do); the engine is otherwise stateless across tests."""
    from fastdet_tpu.models import weights
    from fastdet_tpu.runtime.engine import DetectionEngine

    spec, params = weights.load_model("synthetic:tiny", num_classes=80)
    return DetectionEngine(spec, params, mode="f32", buckets=(1, 2))
