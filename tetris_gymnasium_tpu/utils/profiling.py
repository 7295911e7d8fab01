"""Profiling helpers around ``jax.profiler``.

The reference has no profiling support at all (SURVEY.md §5); its examples
only log host-side SPS.  Here profiling is first-class: every hot path is
one XLA program, so one device trace of a single step/rollout call shows the
full pipeline (fusion boundaries, HBM traffic, per-fusion FLOPs).

Typical uses::

    from tetris_gymnasium_tpu.utils import profiling

    # 1. capture a trace of a code block (view with TensorBoard or xprof)
    with profiling.trace("/tmp/tetris-trace"):
        states, *_ = jit_step(states, actions)
        jax.block_until_ready(states)

    # 2. label regions so they are attributable in the trace
    with profiling.annotate("rollout"):
        ...

    # 3. quick wall-clock timing with a compile/dispatch fence
    stats = profiling.time_fn(lambda: jit_step(states, actions), repeats=20)
    print(stats)   # {"mean_s": ..., "best_s": ..., "calls_per_s": ...}

``bench.py`` and the training examples accept ``--profile DIR`` /
``BENCH_PROFILE=DIR`` to capture traces of their timed sections.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str], create_perfetto_link: bool = False):
    """``jax.profiler.trace`` as a no-op-when-disabled context manager.

    Pass ``logdir=None`` to disable — call sites can thread an optional CLI
    flag straight through without branching.
    """
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir, create_perfetto_link=create_perfetto_link):
        yield


def annotate(name: str):
    """Named region for trace attribution (``jax.profiler.TraceAnnotation``)."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(
    fn: Callable[[], Any], repeats: int = 10, warmup: int = 2
) -> Dict[str, float]:
    """Wall-clock a device callable with a readback fence per call.

    The fence is ``jax.block_until_ready`` on the call's result, so the
    number includes device execution, not just async dispatch.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    mean = sum(times) / len(times)
    return {
        "mean_s": mean,
        "best_s": min(times),
        "calls_per_s": 1.0 / mean if mean else float("inf"),
    }


def save_device_memory_profile(path: str) -> None:
    """Dump the current device memory profile (pprof format)."""
    jax.profiler.save_device_memory_profile(path)
