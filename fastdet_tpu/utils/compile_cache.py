"""Persistent XLA compilation cache setup.

First compiles are expensive (especially through remote-compile backends);
enabling jax's persistent cache makes warmup after the first process run
near-instant. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/fastdet_tpu/xla")


def enable_compile_cache(path: str = _DEFAULT_DIR) -> None:
    import jax

    try:
        backend = jax.default_backend()
        if backend == "cpu":
            # CPU AOT artifacts bake in host machine features; under this
            # machine's remote-compile plugin the compiling host differs
            # from the executing host, and stale artifacts can SIGILL.
            # The cache only pays off for the (remote) TPU backend anyway.
            return
        path = os.path.join(path, backend)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
