"""Test harness config.

Forces JAX onto a virtual 8-device CPU mesh *before* jax is imported so that
sharding tests exercise real multi-device paths without TPU hardware
(mirrors how the reference tests exercise vmap-vs-loop equivalence,
ref: tests/test_functional/test_jax_compat.py).
"""
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
# The upstream reference is used read-only as a parity oracle.
if os.path.isdir(REFERENCE_ROOT) and REFERENCE_ROOT not in sys.path:
    sys.path.append(REFERENCE_ROOT)

import jax  # noqa: E402
import pytest  # noqa: E402

# Env vars are NOT sufficient here: this machine's interpreter boots with a
# sitecustomize that registers the TPU PJRT plugin before any test code runs,
# so JAX_PLATFORMS/XLA_FLAGS set in-process are ignored and the suite would
# silently grab (and contend for) the single real chip.  The config API works
# post-import and is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# XLA-CPU compiles are slow in this environment (~0.4 s per op, minutes for a
# full step program); the persistent cache makes reruns near-instant.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def reference_available() -> bool:
    try:
        import tetris_gymnasium.functional.core  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not importable"
)
