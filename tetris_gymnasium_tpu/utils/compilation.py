"""Compilation-cache setup shared by benches/examples.

XLA compiles are the dominant startup cost for this engine (the step program
is large relative to its runtime); the persistent cache amortises them across
processes.  Call :func:`enable_persistent_cache` before the first jit.
"""
from __future__ import annotations

import os

import jax


def enable_persistent_cache(path: str | None = None) -> None:
    """Enable JAX's on-disk compilation cache (idempotent)."""
    path = path or os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
