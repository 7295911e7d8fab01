"""Grouped (placement) action wrapper for the Gymnasium shell.

API parity with the reference ``GroupedActionsObservations``
(ref: tetris_gymnasium/wrappers/grouped.py): ``Discrete(width * 4)`` actions
encoded ``column * 4 + rotation``, per-candidate observations, legality mask
in ``info["action_mask"]``, illegal actions either terminating or penalising.

All placement enumeration runs in the fused device kernel of
:mod:`tetris_gymnasium_tpu.core.grouped` (one vmapped program for all
``width*4`` candidates) instead of the reference's per-candidate Python drop
loops (ref: grouped.py:148-181).
"""
from __future__ import annotations

from typing import Optional, Sequence

import gymnasium as gym
import numpy as np
from gymnasium import spaces

import jax

from tetris_gymnasium_tpu.core import grouped
from tetris_gymnasium_tpu.core.grouped import GroupedState
from tetris_gymnasium_tpu.ops.observations import sidebar_width
from tetris_gymnasium_tpu.wrappers.observation import (
    FeatureVectorObservation,
    RgbObservation,
)


class GroupedActionsObservations(gym.Wrapper, gym.utils.RecordConstructorArgs):
    """Placement-MDP view: actions are (column, rotation) pairs."""

    def __init__(
        self,
        env: gym.Env,
        observation_wrappers: Optional[Sequence[gym.ObservationWrapper]] = None,
        terminate_on_illegal_action: bool = True,
        mode: Optional[str] = None,
    ):
        gym.utils.RecordConstructorArgs.__init__(
            self,
            observation_wrappers=observation_wrappers,
            terminate_on_illegal_action=terminate_on_illegal_action,
            mode=mode,
        )
        super().__init__(env)
        cfg = env.unwrapped.config
        self.config = cfg
        self.terminate_on_illegal_action = terminate_on_illegal_action
        self.observation_wrappers = list(observation_wrappers or [])

        # Reference API compat (ref: grouped.py:183-206): inner observation
        # wrappers apply to EVERY candidate, rebuilt as a Dict obs (candidate
        # board, zero active mask, live queue/holder).  Known single-wrapper
        # chains run fully batched on device ("features"/"rgb" kernel modes);
        # any other chain of observation wrappers runs through the generic
        # host path; anything that is not an observation wrapper raises —
        # never a silent fall-back to a different observation (round-4
        # review missing #1/weak #4).
        if mode is None:
            ws = self.observation_wrappers
            if not ws:
                mode = "boards"
            elif len(ws) == 1 and isinstance(ws[0], FeatureVectorObservation):
                mode = "features"
            elif len(ws) == 1 and isinstance(ws[0], RgbObservation):
                mode = "rgb"
            else:
                for w in ws:
                    if not callable(getattr(w, "observation", None)):
                        raise TypeError(
                            f"inner observation wrapper {w!r} has no "
                            ".observation(); GroupedActionsObservations can "
                            "only honor gym.ObservationWrapper-style inner "
                            "wrappers (ref: grouped.py:183-206)"
                        )
                mode = "host"
        self.mode = mode

        n_actions = cfg.width * 4
        self.action_space = spaces.Discrete(n_actions)
        high = float(cfg.height * cfg.width)
        obs_dtype = np.float32
        if mode == "features":
            inner = (cfg.width + 3,)
        elif mode == "rgb":
            side = sidebar_width(cfg.padding, cfg.queue_size, cfg.holder_size)
            inner = (cfg.padded_height, cfg.padded_width + side, 3)
            high, obs_dtype = 255.0, np.uint8
        elif mode == "host":
            # the chain's LAST wrapper defines the per-candidate space —
            # including its bounds and dtype, so e.g. an RGB-emitting chain
            # declares 0..255 uint8 and the illegal sentinel (space.high)
            # stays out of band of ordinary id boards
            last_space = self.observation_wrappers[-1].observation_space
            inner = tuple(last_space.shape)
            high = float(np.max(last_space.high))
            obs_dtype = last_space.dtype
        else:
            inner = (cfg.padded_height, cfg.padded_width)
        self.observation_space = spaces.Box(
            0, high, (n_actions, *inner), dtype=obs_dtype
        )
        self._obs_dtype = obs_dtype
        self.legal_actions_mask = np.ones(n_actions, dtype=np.float32)

        # The host chain consumes raw per-candidate id boards.
        kernel_mode = "boards" if mode == "host" else mode
        self._observe = grouped.jit_observation(cfg, kernel_mode)
        self._step = grouped.jit_step(cfg, kernel_mode, terminate_on_illegal_action)
        self._gstate: Optional[GroupedState] = None

    def _board_info(self, base_obs: dict):
        """The base Dict obs chained through the inner observation wrappers
        (ref: grouped.py:260-264, 285-290 — ``info["board"]`` feeds replay
        buffers in train_lin_grouped.py:344-351)."""
        board = base_obs
        for wrapper in self.observation_wrappers:
            board = wrapper.observation(board)
        return board

    def _apply_candidates(self, boards: np.ndarray, base_obs: dict) -> np.ndarray:
        """Chain the inner wrappers over every candidate board (host path).

        Reference semantics (ref: grouped.py:183-206): each candidate is
        rebuilt as a Dict obs — candidate board, zeroed active-piece mask,
        the live holder/queue strips — then every wrapper's ``observation()``
        applies in order.  A FeatureVectorObservation in the chain computes
        from the candidate board it was handed (``features_of_board``), not
        the live env state.
        """
        outs = []
        for a in range(boards.shape[0]):
            board = np.asarray(boards[a])
            o: object = {
                "board": board,
                "active_tetromino_mask": np.zeros_like(board),
                "holder": base_obs["holder"],
                "queue": base_obs["queue"],
            }
            for w in self.observation_wrappers:
                if isinstance(w, FeatureVectorObservation) and isinstance(o, dict):
                    o = w.features_of_board(o["board"])
                else:
                    o = w.observation(o)
            outs.append(np.asarray(o))
        return np.stack(outs).astype(self._obs_dtype)

    def reset(self, *, seed=None, options=None):
        """Reset the base env and enumerate the first piece's placements."""
        base_obs, info = self.env.reset(seed=seed, options=options)
        env_state = self.env.unwrapped.state
        obs, mask = self._observe(env_state)
        self._gstate = GroupedState(env=env_state, mask=mask)
        self.legal_actions_mask = np.asarray(mask)
        info["board"] = self._board_info(base_obs)
        info["action_mask"] = self.legal_actions_mask
        if self.mode == "host":
            return self._apply_candidates(np.asarray(obs), base_obs), info
        return np.asarray(obs, dtype=self._obs_dtype), info

    def step(self, action: int):
        """Place the active piece at the decoded (column, rotation)."""
        was_legal = bool(self.legal_actions_mask[int(action)])
        gstate, obs, reward, done, info = self._step(self._gstate, np.int32(action))
        self._gstate = gstate
        self.env.unwrapped.state = gstate.env
        self.legal_actions_mask = np.asarray(gstate.mask)
        out_info = {
            "action_mask": self.legal_actions_mask,
            "lines_cleared": int(info["lines_cleared"]),
        }
        base_obs = None
        if was_legal:
            base_obs = self.env.unwrapped._to_numpy(
                self.env.unwrapped._observe(gstate.env)
            )
            out_info["board"] = self._board_info(base_obs)
        if self.mode == "host":
            if not was_legal and self.terminate_on_illegal_action:
                # ref: grouped.py:221-224 — ones * observation_space.high,
                # no wrapper chain on the sentinel
                obs_out = np.full(
                    self.observation_space.shape,
                    self.observation_space.high.flat[0],
                    dtype=self._obs_dtype,
                )
            else:
                if base_obs is None:  # illegal no-op path still observes
                    base_obs = self.env.unwrapped._to_numpy(
                        self.env.unwrapped._observe(gstate.env)
                    )
                obs_out = self._apply_candidates(np.asarray(obs), base_obs)
        else:
            obs_out = np.asarray(obs, dtype=self._obs_dtype)
        return (
            obs_out,
            float(reward),
            bool(done),
            False,
            out_info,
        )

    @staticmethod
    def encode_action(x: int, r: int) -> int:
        """(column, rotation) -> action id (ref: grouped.py:78-88)."""
        return grouped.encode_action(x, r)

    @staticmethod
    def decode_action(action: int):
        """action id -> (column, rotation) (ref: grouped.py:90-99)."""
        return grouped.decode_action(np.int32(action))
