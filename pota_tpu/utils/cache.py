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

    cache_dir = path or os.environ.get("POTA_JAX_CACHE", _DEFAULT_DIR)
    # key by backend: CPU AOT results compiled through the axon remote-compile
    # tunnel carry that machine's CPU features and SIGILL-warn locally
    cache_dir = os.path.join(cache_dir, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
