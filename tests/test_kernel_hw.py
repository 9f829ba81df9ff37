"""TPU-hardware (non-interpret) kernel parity.

The quick tier runs Pallas kernels in interpret mode on CPU — true f32,
so MXU bf16-truncation bugs are invisible to it (advisor r4 high). This
test subprocess-runs tools/verify_kernel_tpu.py with the ambient axon
environment restored (the pytest boot plugin strips it to force CPU)
and skips when no TPU is reachable.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_sparse_kernel_bit_exact_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("FASTDET_TEST_REEXEC", None)
    env.pop("JAX_DEFAULT_MATMUL_PRECISION", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    site = "/root/.axon_site"
    if not os.path.isdir(site):
        pytest.skip("axon TPU site unavailable on this machine")
    env["PYTHONPATH"] = os.pathsep.join(
        [site] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and ".axon_site" not in p])
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "verify_kernel_tpu.py")],
        env=env, capture_output=True, text=True, timeout=1800)
    out = proc.stdout + proc.stderr
    if proc.returncode == 2:
        pytest.skip(f"no TPU: {proc.stdout.strip()}")
    assert proc.returncode == 0, out[-3000:]
    assert "OK: randomized case bit-exact" in out
