"""Gymnasium environment shell + registration.

Registers ``"tetris_gymnasium_tpu/Tetris"`` mirroring the reference's
``"tetris_gymnasium/Tetris"`` entry (ref: tetris_gymnasium/envs/__init__.py:10-14;
no ``max_episode_steps``, as in the reference).
"""
from gymnasium.envs.registration import register

from tetris_gymnasium_tpu.envs.gym_env import Tetris

try:
    # the vector adapter needs gymnasium >= 1.1 (AutoresetMode); the plain
    # single-env shell must keep importing on older gymnasium pins
    from tetris_gymnasium_tpu.envs.vector_env import TetrisVectorEnv

    __all__ = ["Tetris", "TetrisVectorEnv"]
except ImportError:  # pragma: no cover — exercised only on old gymnasium
    __all__ = ["Tetris"]

register(
    id="tetris_gymnasium_tpu/Tetris",
    entry_point="tetris_gymnasium_tpu.envs.gym_env:Tetris",
)
