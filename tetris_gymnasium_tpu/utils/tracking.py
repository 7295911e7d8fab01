"""Optional experiment tracking: wandb when available, silent no-op otherwise.

The reference examples wire Weights & Biases directly into their training
scripts (ref: examples/train_cnn.py:215-240).  Here tracking is an optional
sink behind one small class so the examples stay runnable on machines
without the package (it is not part of this framework's dependencies): the
``--wandb`` flag requests it, and if ``import wandb`` fails the tracker
degrades to a no-op with a single warning — the JSONL/TensorBoard logs are
always the source of truth.
"""
from __future__ import annotations

import sys
from typing import Optional


class Tracker:
    """Log training scalars (and videos) to wandb if requested and present.

    Every record logged here is the SAME dict the example writes to its
    JSONL, so a wandb run mirrors the committed curves exactly.
    """

    def __init__(
        self,
        enabled: bool,
        project: str = "tetris-gymnasium-tpu",
        run_name: Optional[str] = None,
        config: Optional[dict] = None,
    ):
        self._run = None
        if not enabled:
            return
        try:
            import wandb
        except ImportError:
            print(
                "wandb requested but not importable; continuing without "
                "experiment tracking (JSONL logging is unaffected)",
                file=sys.stderr,
            )
            return
        self._run = wandb.init(project=project, name=run_name, config=config or {})

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, record: dict, step: int) -> None:
        """Mirror one JSONL record as wandb scalars."""
        if self._run is not None:
            self._run.log(
                {k: v for k, v in record.items() if isinstance(v, (int, float))},
                step=step,
            )

    def log_video(self, path: str, step: int, tag: str = "episode") -> None:
        """Attach a recorded episode video/GIF to the run."""
        if self._run is not None:
            import wandb

            self._run.log({tag: wandb.Video(path)}, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
            self._run = None
