"""Training observability: steps-per-second meter + scalar logging.

The reference logs `charts/SPS` and episode stats to TensorBoard inside its
examples (ref: examples/train_cnn.py:339-344, train_ppo.py:368-371).  Here
the equivalents are reusable: an :class:`SpsMeter` for throughput and a
:class:`ScalarLogger` that writes TensorBoard event files when a writer
backend is available (torch's SummaryWriter is baked into this image) and
degrades to stdout otherwise.  For kernel-level profiling use
``jax.profiler.trace`` around a jitted step — the engine is one XLA program,
so a single trace shows the whole pipeline.
"""
from __future__ import annotations

import time
from typing import Optional


class SpsMeter:
    """Steps-per-second over a sliding window of `report_every` calls."""

    def __init__(self, steps_per_call: int, report_every: int = 100):
        self.steps_per_call = steps_per_call
        self.report_every = report_every
        self._t0 = time.perf_counter()
        self._start = self._t0
        self._calls = 0
        self._total_calls = 0

    def tick(self) -> Optional[float]:
        """Count one call; returns windowed SPS every `report_every` calls."""
        self._calls += 1
        self._total_calls += 1
        if self._calls < self.report_every:
            return None
        now = time.perf_counter()
        sps = self._calls * self.steps_per_call / (now - self._t0)
        self._t0 = now
        self._calls = 0
        return sps

    @property
    def lifetime_sps(self) -> float:
        dt = time.perf_counter() - self._start
        return self._total_calls * self.steps_per_call / max(dt, 1e-9)


class ScalarLogger:
    """TensorBoard scalar logger with stdout fallback.

    Uses torch.utils.tensorboard when importable (as the reference examples
    do, ref: train_cnn.py:215-240); otherwise prints `tag=value` lines.
    """

    def __init__(self, logdir: Optional[str] = None):
        self._writer = None
        if logdir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(logdir)
            except Exception:
                self._writer = None

    def log(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)
        else:
            print(f"[{step}] {tag}={value:.6g}", flush=True)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
