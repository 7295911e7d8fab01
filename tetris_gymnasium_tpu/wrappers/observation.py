"""Observation wrappers for the Gymnasium shell.

Same API surface as the reference wrappers
(ref: tetris_gymnasium/wrappers/observation.py) but all pixel/feature math
runs as jitted device code shared with the batched engine
(:mod:`tetris_gymnasium_tpu.ops.observations`) — the wrapper is only the
numpy boundary.
"""
from __future__ import annotations

import functools

import gymnasium as gym
import numpy as np
from gymnasium import spaces

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.ops.observations import (
    FeatureFlags,
    compose_rgb,
    feature_vector,
    upscale_rgb,
)
from tetris_gymnasium_tpu.pieces import PIECES


class RgbObservation(gym.ObservationWrapper, gym.utils.RecordConstructorArgs):
    """Dict obs -> one RGB image (board left, queue/holder sidebar right).

    Layout and palette parity with the reference wrapper
    (ref: wrappers/observation.py:11-115); the composite is produced by the
    same fused kernel the batched RGB pipeline uses.
    """

    def __init__(self, env: gym.Env):
        gym.utils.RecordConstructorArgs.__init__(self)
        super().__init__(env)
        cfg = env.unwrapped.config
        side = max(cfg.queue_size, env.unwrapped.config.holder_size) * cfg.padding
        self.observation_space = spaces.Box(
            0, 255, (cfg.padded_height, cfg.padded_width + side, 3), dtype=np.uint8
        )
        # Use the env's actual piece set (custom `tetrominoes`/`base_pixels`
        # change the palette; ref: wrappers/observation.py:44-74 reads
        # env.pixels) — not the default-pieces cache.
        pieces = getattr(env.unwrapped, "pieces", PIECES)
        self._pieces = pieces
        self._compose = jax.jit(functools.partial(compose_rgb, pieces=pieces))
        self._render_rgb = jax.jit(
            functools.partial(engine.render_rgb, config=cfg, pieces=pieces)
        )

    def observation(self, observation: dict) -> np.ndarray:
        """Composite the Dict observation into one RGB frame."""
        return np.asarray(
            self._compose(
                jnp.asarray(observation["board"]),
                jnp.asarray(observation["queue"]),
                jnp.asarray(observation["holder"]),
            )
        )

    def render(self):
        """Upscaled RGB rendering of the composite observation
        (ref: wrappers/observation.py:76-115)."""
        state = self.env.unwrapped.state
        rgb = self._render_rgb(state)
        scale = self.env.unwrapped.render_scaling_factor
        img = np.asarray(upscale_rgb(rgb, scale))
        if self.render_mode == "rgb_array":
            return img
        if self.render_mode == "human":
            import cv2

            cv2.imshow("Tetris (TPU)", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            cv2.waitKey(1)
        return None


class FeatureVectorObservation(gym.ObservationWrapper, gym.utils.RecordConstructorArgs):
    """Dict obs -> engineered feature vector (heights, max, holes, bumpiness).

    Formula parity with the reference wrapper
    (ref: wrappers/observation.py:118-278), computed on the cropped playfield
    with the active piece removed.  The reference's fancy-index masking bug
    (ref: wrappers/observation.py:252, which zeroes *rows* 0/1 instead of the
    piece cells) is fixed: we mask the actual piece cells.
    """

    def __init__(
        self,
        env: gym.Env,
        report_height: bool = True,
        report_max_height: bool = True,
        report_holes: bool = True,
        report_bumpiness: bool = True,
    ):
        gym.utils.RecordConstructorArgs.__init__(
            self,
            report_height=report_height,
            report_max_height=report_max_height,
            report_holes=report_holes,
            report_bumpiness=report_bumpiness,
        )
        super().__init__(env)
        cfg = env.unwrapped.config
        self.flags = FeatureFlags(
            height=report_height,
            max_height=report_max_height,
            holes=report_holes,
            bumpiness=report_bumpiness,
        )
        n = (
            (cfg.width if report_height else 0)
            + int(report_max_height)
            + int(report_holes)
            + int(report_bumpiness)
        )
        # Bound chosen so the space actually contains every reachable value:
        # heights <= H, holes <= H*W, bumpiness <= H*(W-1).  (The reference
        # declares high=len(tetrominoes)=7, ref: wrappers/observation.py:158,
        # which its own values violate — fixed here, like its masking bug.)
        high = cfg.height * cfg.width
        dtype = np.uint8 if high <= np.iinfo(np.uint8).max else np.int32
        self.observation_space = spaces.Box(0, high, (n,), dtype=dtype)
        pad = cfg.padding

        @jax.jit
        def _features(board):
            crop = board[:-pad, pad:-pad]
            return feature_vector(crop, self.flags)

        self._features = _features

    def observation(self, observation: dict) -> np.ndarray:
        """Feature vector of the locked stack (active piece excluded).

        Computed from the engine state's raw board — the exact stack without
        the projected piece — rather than un-projecting the Dict observation.
        """
        board = jnp.asarray(self.env.unwrapped.state.board)
        return np.asarray(self._features(board), dtype=self.observation_space.dtype)

    def features_of_board(self, board) -> np.ndarray:
        """Feature vector of an explicit padded board (no active piece).

        The per-candidate path of the grouped wrapper: the reference applies
        this wrapper to each rebuilt candidate Dict obs, whose board carries
        no active piece (ref: grouped.py:183-206 feeding
        wrappers/observation.py:226-266) — so features come straight from the
        given board, not the live env state.
        """
        return np.asarray(
            self._features(jnp.asarray(board)), dtype=self.observation_space.dtype
        )
