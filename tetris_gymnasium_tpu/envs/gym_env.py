"""Gymnasium-compatible shell over the flagship TPU engine.

The reference's architecture is inverted here (SURVEY.md §7): its OOP env
(ref: tetris_gymnasium/envs/tetris.py) *is* the engine, stepped cell-by-cell
in numpy; ours is a thin host-side view over the jitted functional engine —
one device program per step, state lives in an :class:`EngineState` pytree.

API parity with the reference ``Tetris(gym.Env)``:
  * Dict observation space with the same keys/shapes
    (``board``, ``active_tetromino_mask``, ``holder``, ``queue``;
    ref: envs/tetris.py:146-178),
  * ``Discrete(8)`` action space with the same action ids
    (ref: mappings/actions.py:12-19),
  * ``(lines ** 2) * width`` line-clear scoring (ref: envs/tetris.py:621-630),
  * ``ansi`` / ``rgb_array`` / ``human`` render modes with the same layout
    (board left, queue top-right, holder bottom-right;
    ref: envs/tetris.py:309-391, wrappers/observation.py:38-74),
  * ``get_state`` / ``set_state`` cloning (ref: envs/tetris.py:681-708) — the
    immutable state pytree makes both O(1) and alias-safe,
  * ``info`` dict with ``lines_cleared`` (ref: envs/tetris.py:271).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import gymnasium as gym
import numpy as np
from gymnasium import spaces

import jax

from tetris_gymnasium_tpu.components.tetromino import (
    Pixel,
    Tetromino as TetrominoPiece,
    pieces_from_tetrominoes,
)
from tetris_gymnasium_tpu.components.tetromino_holder import TetrominoHolder
from tetris_gymnasium_tpu.components.tetromino_queue import TetrominoQueue
from tetris_gymnasium_tpu.components.tetromino_randomizer import Randomizer
from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig, RewardsMapping
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.core.engine import EngineState
from tetris_gymnasium_tpu.ops.observations import upscale_rgb
from tetris_gymnasium_tpu.pieces import PIECES


class Tetris(gym.Env):
    """Single-env Gymnasium view of the flagship engine.

    For RL at scale use the batched/sharded functional API directly
    (:mod:`tetris_gymnasium_tpu.core.engine`,
    :mod:`tetris_gymnasium_tpu.parallel`); this class exists for API
    compatibility, debugging and interactive play.
    """

    metadata = {"render_modes": ["ansi", "rgb_array", "human"], "render_fps": 1}

    def __init__(
        self,
        render_mode: Optional[str] = None,
        width: int = 10,
        height: int = 20,
        gravity: bool = True,
        queue_size: int = 4,
        holder_size: int = 1,
        actions_mapping: ActionsMapping = ActionsMapping(),
        rewards_mapping: RewardsMapping = RewardsMapping(),
        render_upscale: int = 10,
        randomizer=None,
        queue: Optional[TetrominoQueue] = None,
        holder: Optional[TetrominoHolder] = None,
        tetrominoes: Optional[Sequence[TetrominoPiece]] = None,
        base_pixels: Optional[Sequence[Pixel]] = None,
    ):
        """Pluggable components mirror the reference constructor
        (ref: envs/tetris.py:77-107):

        * ``randomizer`` — a :class:`Randomizer` instance (BagRandomizer /
          TrueRandomizer / a custom subclass whose ``engine_kind`` names a
          registered pure strategy) or a strategy name string; default "bag".
        * ``queue`` / ``holder`` — :class:`TetrominoQueue` /
          :class:`TetrominoHolder` handles; their sizes (and the queue's
          randomizer) configure the engine.
        * ``tetrominoes`` / ``base_pixels`` — custom piece sets, compiled to
          static device tables (board padding = the pieces' box size, as in
          ref: envs/tetris.py:131).
        """
        if queue is not None:
            queue_size = queue.size
            # The injected queue's own randomizer drives piece draws, even if
            # a separate `randomizer` was also passed (ref: envs/tetris.py
            # constructor — the queue owns its randomizer).
            if queue.randomizer is not None:
                randomizer = queue.randomizer
        if holder is not None:
            holder_size = holder.size
        if randomizer is None:
            randomizer = "bag"
        if isinstance(randomizer, str):
            queue_kind = randomizer
        else:
            if isinstance(randomizer, Randomizer) and not any(
                "engine_kind" in vars(klass)
                for klass in type(randomizer).__mro__[:-1]
                if klass is not Randomizer
            ) and type(randomizer) is not Randomizer:
                import warnings

                warnings.warn(
                    f"{type(randomizer).__name__} does not declare "
                    "`engine_kind`; the engine will use the inherited "
                    "default ('bag') for on-device draws, which may not "
                    "match get_next_tetromino(). Set engine_kind explicitly "
                    "on the subclass.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            queue_kind = randomizer.engine_kind

        if tetrominoes is not None or base_pixels is not None:
            if tetrominoes is None:
                from tetris_gymnasium_tpu.components.tetromino import (
                    default_tetrominoes,
                )

                tetrominoes = default_tetrominoes()
            pieces, padding = pieces_from_tetrominoes(tetrominoes, base_pixels)
        else:
            pieces, padding = PIECES, 4

        self.config = EngineConfig(
            width=width,
            height=height,
            padding=padding,
            queue_size=queue_size,
            holder_size=holder_size,
            gravity_enabled=gravity,
            queue_kind=queue_kind,
        )
        self.actions = actions_mapping
        self.rewards = rewards_mapping
        self.render_mode = render_mode
        self.render_scaling_factor = render_upscale
        self.pieces = pieces

        cfg = self.config
        pad = cfg.padding
        hw = (cfg.padded_height, cfg.padded_width)
        max_id = int(np.max(pieces.ids))
        self.observation_space = spaces.Dict(
            {
                "board": spaces.Box(0, max_id, hw, dtype=np.uint8),
                "active_tetromino_mask": spaces.Box(0, 1, hw, dtype=np.uint8),
                "holder": spaces.Box(0, max_id, (pad, pad * holder_size), dtype=np.uint8),
                "queue": spaces.Box(0, max_id, (pad, pad * queue_size), dtype=np.uint8),
            }
        )
        self.action_space = spaces.Discrete(8)

        # Custom action numberings (ref: tetris.py:98 `actions_mapping` kwarg)
        # are a host-side translation: user id -> the engine's canonical id.
        # The mapping must be a bijection of 0..7 — a duplicate or
        # out-of-range id would silently overwrite another action's slot
        # (round-2 review weak #6), so validate before building the table.
        defaults = ActionsMapping()
        action_names = (
            "move_left", "move_right", "move_down", "rotate_clockwise",
            "rotate_counterclockwise", "hard_drop", "swap", "no_op",
        )
        user_ids = {name: int(getattr(actions_mapping, name)) for name in action_names}
        bad = {n: i for n, i in user_ids.items() if not 0 <= i < 8}
        if bad:
            raise ValueError(f"actions_mapping ids must be in 0..7, got {bad}")
        if len(set(user_ids.values())) != 8:
            dupes = {
                i: [n for n, j in user_ids.items() if j == i]
                for i in set(user_ids.values())
                if sum(j == i for j in user_ids.values()) > 1
            }
            raise ValueError(f"actions_mapping ids must be distinct, got {dupes}")
        self._action_table = np.zeros(8, dtype=np.int32)
        for name in action_names:
            self._action_table[user_ids[name]] = getattr(defaults, name)

        if pieces is PIECES:
            self._step = engine.jit_step(cfg, rewards=rewards_mapping)
            self._reset = engine.jit_reset(cfg)
            self._rgb = engine.jit_render_rgb(cfg)
            self._observe = engine.jit_observe(cfg)
        else:
            # Custom piece tables are not hashable cache keys; build
            # dedicated jitted programs closing over them.
            self._step = jax.jit(
                functools.partial(
                    engine.step, config=cfg, pieces=pieces, rewards=rewards_mapping
                )
            )
            self._reset = jax.jit(
                functools.partial(engine.reset, config=cfg, pieces=pieces)
            )
            self._rgb = jax.jit(
                functools.partial(engine.render_rgb, config=cfg, pieces=pieces)
            )
            self._observe = jax.jit(
                functools.partial(engine.observe_dict, config=cfg, pieces=pieces)
            )
        self.state: Optional[EngineState] = None
        self._window_open = False

    # -- Gymnasium API ------------------------------------------------------

    def reset(
        self, *, seed: Optional[int] = None, options: Optional[dict] = None
    ) -> Tuple[dict, dict]:
        """Start a new episode; the JAX PRNG stream is seeded from ``seed``."""
        super().reset(seed=seed)
        if seed is None:
            seed = int(self.np_random.integers(0, 2**31 - 1))
        key = jax.random.PRNGKey(seed)
        self.state, obs = self._reset(key)
        if self.render_mode == "human":
            self.render()
        return self._to_numpy(obs), {}

    def step(self, action: int) -> Tuple[dict, float, bool, bool, dict]:
        """One engine step; returns (obs, reward, terminated, truncated, info)."""
        if self.state is None:
            raise RuntimeError("Call reset() before step().")
        # out-of-range ids reach the engine untranslated: a branch-free no-op
        # there, like the reference's unmatched if/elif (ref: tetris.py:223-256)
        engine_action = (
            self._action_table[int(action)] if 0 <= int(action) < 8 else np.int32(action)
        )
        self.state, obs, reward, done, info = self._step(
            self.state, np.int32(engine_action)
        )
        if self.render_mode == "human":
            self.render()
        return (
            self._to_numpy(obs),
            float(reward),
            bool(done),
            False,
            {"lines_cleared": int(info["lines_cleared"])},
        )

    def render(self):
        """Render the current state (``ansi`` string / ``rgb_array`` / window)."""
        if self.render_mode == "ansi":
            return self._render_ansi()
        rgb = np.asarray(self._rgb(self.state))
        if self.render_mode == "rgb_array":
            return rgb
        if self.render_mode == "human":
            import cv2

            scale = self.render_scaling_factor
            img = np.asarray(upscale_rgb(rgb, scale))
            cv2.imshow("Tetris (TPU)", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            cv2.waitKey(1)
            self._window_open = True
            return None
        return None

    def close(self):
        """Close any render window."""
        if self._window_open:
            import cv2

            cv2.destroyAllWindows()
            self._window_open = False

    # -- State cloning (ref: envs/tetris.py:681-708) ------------------------

    def get_state(self) -> EngineState:
        """Snapshot of the full env state (immutable pytree — zero-copy)."""
        return self.state

    def set_state(self, state: EngineState) -> None:
        """Restore a snapshot taken with :meth:`get_state`."""
        self.state = state

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _to_numpy(obs: dict) -> dict:
        return {k: np.asarray(v) for k, v in obs.items()}

    def _render_ansi(self) -> str:
        """Character rendering of the projected board, padding cropped
        (parity with ref: envs/tetris.py:352-360: cell ids as characters,
        ``.`` for empty)."""
        board = np.asarray(self._observe(self.state)["board"])
        pad = self.config.padding
        projection = board[:-pad, pad:-pad]
        char_field = np.where(projection == 0, ".", projection.astype(str))
        return "\n".join("".join(row) for row in char_field)
