"""Gymnasium environment shell + registration.

Registers ``"tetris_gymnasium_tpu/Tetris"`` mirroring the reference's
``"tetris_gymnasium/Tetris"`` entry (ref: tetris_gymnasium/envs/__init__.py:10-14;
no ``max_episode_steps``, as in the reference).
"""
from gymnasium.envs.registration import register

from tetris_gymnasium_tpu.envs.gym_env import Tetris

# The vector adapter needs gymnasium >= 1.1 (AutoresetMode); the plain
# single-env shell must keep importing on older gymnasium pins.  Probe ONLY
# the gymnasium feature — any other import failure in vector_env must
# propagate, not silently drop TetrisVectorEnv from the package.
try:
    from gymnasium.vector import AutoresetMode as _AutoresetMode  # noqa: F401
except ImportError:  # pragma: no cover — exercised only on old gymnasium
    __all__ = ["Tetris"]
else:
    from tetris_gymnasium_tpu.envs.vector_env import TetrisVectorEnv

    __all__ = ["Tetris", "TetrisVectorEnv"]

register(
    id="tetris_gymnasium_tpu/Tetris",
    entry_point="tetris_gymnasium_tpu.envs.gym_env:Tetris",
)
