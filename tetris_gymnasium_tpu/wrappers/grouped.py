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
from tetris_gymnasium_tpu.wrappers.observation import FeatureVectorObservation


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

        # Reference API compat: passing a FeatureVectorObservation as an inner
        # observation wrapper selects per-candidate feature vectors
        # (ref: grouped.py:183-206); otherwise raw candidate boards.
        if mode is None:
            mode = "boards"
            for w in observation_wrappers or []:
                if isinstance(w, FeatureVectorObservation):
                    mode = "features"
        self.mode = mode

        n_actions = cfg.width * 4
        self.action_space = spaces.Discrete(n_actions)
        if mode == "features":
            inner = (cfg.width + 3,)
        else:
            inner = (cfg.padded_height, cfg.padded_width)
        self.observation_space = spaces.Box(
            0, float(cfg.height * cfg.width), (n_actions, *inner), dtype=np.float32
        )
        self.legal_actions_mask = np.ones(n_actions, dtype=np.float32)

        self._observe = grouped.jit_observation(cfg, mode)
        self._step = grouped.jit_step(cfg, mode, terminate_on_illegal_action)
        self._gstate: Optional[GroupedState] = None

    def _board_info(self, base_obs: dict):
        """The base Dict obs chained through the inner observation wrappers
        (ref: grouped.py:260-264, 285-290 — ``info["board"]`` feeds replay
        buffers in train_lin_grouped.py:344-351)."""
        board = base_obs
        for wrapper in self.observation_wrappers:
            board = wrapper.observation(board)
        return board

    def reset(self, *, seed=None, options=None):
        """Reset the base env and enumerate the first piece's placements."""
        base_obs, info = self.env.reset(seed=seed, options=options)
        env_state = self.env.unwrapped.state
        obs, mask = self._observe(env_state)
        self._gstate = GroupedState(env=env_state, mask=mask)
        self.legal_actions_mask = np.asarray(mask)
        info["board"] = self._board_info(base_obs)
        info["action_mask"] = self.legal_actions_mask
        return np.asarray(obs, dtype=np.float32), info

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
        if was_legal:
            base_obs = self.env.unwrapped._to_numpy(
                self.env.unwrapped._observe(gstate.env)
            )
            out_info["board"] = self._board_info(base_obs)
        return (
            np.asarray(obs, dtype=np.float32),
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
