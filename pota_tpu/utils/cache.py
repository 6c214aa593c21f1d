"""Persistent XLA compilation cache setup.

Compiles of the full render pipeline are expensive (especially on the CPU
dev box); caching them across processes makes tests and CLI iteration fast.
Import-and-call once at process start; safe to call repeatedly.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    if jax.default_backend() == "cpu":
        # CPU compiles round-trip the axon remote-compile service, whose AOT
        # results carry THAT machine's CPU features; loading them locally
        # warned about SIGILL for rounds and now actually SEGFAULTS the
        # process (r5: two full-suite runs crashed inside
        # backend_compile_and_load).  The cache never helped CPU runs here
        # (NOTES r3) — keep it off.
        return
    cache_dir = path or os.environ.get("POTA_JAX_CACHE", _DEFAULT_DIR)
    cache_dir = os.path.join(cache_dir, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
