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
            # FASTDET_CPU_CACHE=1 opts in when all compiles are known
            # local (the test boot plugin sets it after stripping the
            # remote plugin) — big CPU graphs then cache across runs.
            if os.environ.get("FASTDET_CPU_CACHE") != "1":
                return
            # Belt-and-braces: even with the opt-in set, refuse if this
            # process was started WITH the remote-compile sitecustomize
            # (observed: one such process writing AMX-featured artifacts
            # poisons the cache for every honest local reader, which then
            # logs machine-feature mismatches and risks SIGILL).
            import sys

            sc = sys.modules.get("sitecustomize")
            if sc is not None and ".axon_site" in (getattr(sc, "__file__", "") or ""):
                return
        if backend == "cpu":
            # Partition CPU artifacts by host CPU identity: this
            # container's cache volume can outlive the physical host it
            # ran on, and XLA:CPU AOT results bake in machine features —
            # a cache written on an AMX-capable host fails feature
            # checks on the next one (observed: every load logging
            # 'machine-feature mismatch ... SIGILL' and recompiling,
            # which silently tripled the quick test tier).
            import hashlib
            import platform

            import sys as _sys

            sc = _sys.modules.get("sitecustomize")
            ident = ":".join([
                platform.machine(), platform.processor(),
                jax.__version__,
                # the axon plugin's jaxlib emits AOT artifacts with
                # pseudo-features (prefer-no-gather/-scatter) a stripped
                # local process can't load — same host, different stack
                "axon" if ".axon_site" in (getattr(sc, "__file__", "")
                                           or "") else "plain",
            ])
            try:
                with open("/proc/cpuinfo") as fp:
                    for line in fp:
                        if line.startswith("flags"):
                            ident += ":" + line.strip()
                            break
            except OSError:
                pass
            backend += "-" + hashlib.sha1(ident.encode()).hexdigest()[:10]
        path = os.path.join(path, backend)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
