"""tetris_gymnasium_tpu — a TPU-native Tetris environment engine.

A from-scratch re-design of Max-We/Tetris-Gymnasium for TPU: one batched,
mesh-shardable pure-JAX core; Gymnasium compatibility, rendering and wrappers
are thin views over it.

Layers (bottom-up):
  * ``pieces`` / ``config``  — static tables and hashable configs.
  * ``ops``                  — branch-free board kernels, queue RNG ops.
  * ``core.fn_env``          — compat engine, bit-exact with the reference
                               functional env (``tetris_fn``).
  * ``core.engine``          — flagship engine: 8 actions, holder/swap,
                               preview queue, auto-reset, fused observations.
  * ``core.turbo``           — turbo engine: batch-minor bit-packed hot path,
                               trajectory-equivalent to the flagship.
  * ``core.turbo_grouped``   — placement MDP on the turbo kernels.
  * ``parallel``             — device-mesh sharding of env batches.
  * ``envs`` / ``wrappers``  — Gymnasium-compatible shell.
  * ``models`` / ``rl``      — Flax networks + on-device RL training loops.
"""

import os as _os

if not _os.environ.get("TETRIS_TPU_NO_CACHE"):
    # XLA compiles dominate startup for this engine (the step program is large
    # relative to its microsecond runtime); the on-disk cache makes every
    # process after the first start instantly.  Opt out: TETRIS_TPU_NO_CACHE=1.
    from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache

    enable_persistent_cache()

from tetris_gymnasium_tpu.config import (
    ActionsMapping,
    EngineConfig,
    EnvConfig,
    RewardsMapping,
)
from tetris_gymnasium_tpu.pieces import PIECES, PieceSet, make_pieces

__version__ = "0.4.0"

__all__ = [
    "ActionsMapping",
    "EngineConfig",
    "EnvConfig",
    "RewardsMapping",
    "PIECES",
    "PieceSet",
    "make_pieces",
    "__version__",
]
