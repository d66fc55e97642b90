"""Persistent XLA compilation cache.

Full-pipeline compiles run ~10-15 min on this class of host (single-core
Python + remote TPU compile); the persistent cache makes every repeat run
start in seconds.  Call once at process start (bench.py and the sweep do)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/sdt_xla") -> None:
    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
