"""Persistent XLA compilation cache.

Kernel compiles cost minutes over some TPU transports (see
BENCH_NOTES.md), so every entry point enables JAX's on-disk compilation
cache.  Override the location with POLYPOLISH_TPU_CACHE_DIR; disable
with POLYPOLISH_TPU_CACHE_DIR=off.
"""

from __future__ import annotations

import os

_DONE = False


def enable_persistent_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    cache_dir = os.environ.get("POLYPOLISH_TPU_CACHE_DIR")
    if cache_dir == "off":
        return
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "polypolish_tpu_xla"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
