"""pytest boot plugin: re-exec the test run in a clean CPU environment.

Why this exists: this machine's sitecustomize (PYTHONPATH=/root/.axon_site)
imports jax at *interpreter start* and registers the experimental `axon`
TPU backend with remote compilation. Consequences for tests:

- conftest-time `JAX_PLATFORMS=cpu` is a no-op (jax is already imported),
- every test process compiles over the TPU tunnel (slow, flaky stalls),
- the virtual 8-device CPU mesh needed by sharding tests can't form.

This module is loaded via ``-p fastdet_test_boot`` (pyproject addopts)
during pytest's pre-parse phase — *before* pytest installs fd capture —
so an os.execve here keeps stdout intact. It restarts the interpreter
with .axon_site stripped, CPU platform, 8 virtual devices, and f32 matmul
precision (the axon stack defaults convolutions to bf16 even on CPU,
which would break numeric-parity tests).
"""

import os
import sys

if os.environ.get("FASTDET_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["FASTDET_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_DEFAULT_MATMUL_PRECISION"] = "float32"
    # axon is stripped above, so every compile in this process tree is
    # LOCAL — CPU executables are safe to cache persistently (the general
    # SIGILL hazard is remote-compiled artifacts; utils/compile_cache.py).
    # This takes the slow tier's big graphs (sharded train step, 416px
    # engines) from minutes to seconds on re-runs.
    env["FASTDET_CPU_CACHE"] = "1"
    # Deterministic warmup in tests: the lazy background warm (engine
    # cold-start optimization) would make ingest-routing assertions racy
    # — which tier a frame rides would depend on whether the background
    # thread finished first. tests/test_lazy_warmup.py re-enables it
    # explicitly to test exactly that machinery.
    env.setdefault("FASTDET_LAZY_WARM", "0")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
