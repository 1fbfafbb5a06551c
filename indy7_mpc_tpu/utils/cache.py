"""Persistent XLA compilation cache (halves repeat-run compile latency).

Call :func:`enable_cache` before the first jit compilation.  The cache is
keyed on the full HLO, so kernel edits invalidate naturally.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", ".jax_cache"
)


def enable_cache(path: str | None = None, min_compile_secs: float = 2.0):
    path = os.path.abspath(path or DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return path
