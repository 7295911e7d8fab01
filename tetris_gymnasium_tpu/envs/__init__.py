"""Gymnasium environment shell + registration.

Registers ``"tetris_gymnasium_tpu/Tetris"`` mirroring the reference's
``"tetris_gymnasium/Tetris"`` entry (ref: tetris_gymnasium/envs/__init__.py:10-14;
no ``max_episode_steps``, as in the reference).
"""
from gymnasium.envs.registration import register

from tetris_gymnasium_tpu.envs.gym_env import Tetris
from tetris_gymnasium_tpu.envs.vector_env import TetrisVectorEnv

register(
    id="tetris_gymnasium_tpu/Tetris",
    entry_point="tetris_gymnasium_tpu.envs.gym_env:Tetris",
)

__all__ = ["Tetris", "TetrisVectorEnv"]
