"""Gymnasium ``VectorEnv`` adapter over the batched device engines.

Reference workflows consume environments through ``gym.vector`` —
``SyncVectorEnv([make_env] * n)`` stepping n Python envs one by one
(ref: examples/train_cnn.py:251-256, train_ppo.py:185-190).  This adapter
exposes the TPU batch through that same API: one object that looks like a
``gymnasium.vector.VectorEnv`` (numpy in / numpy out, Gymnasium autoreset
convention) but whose ``step`` is a single jitted device program over the
whole batch — so any Gymnasium-ecosystem trainer can drive thousands of
envs at device speed without knowing JAX exists.

Autoreset follows Gymnasium's ``AutoresetMode.SAME_STEP``: a terminated
env's returned observation is the FIRST observation of its next episode,
and the terminal observation is delivered in ``infos["final_obs"]`` with
the ``infos["_final_obs"]`` mask (the convention CleanRL-style loops read).
Episode restarts happen on device — the engine steps with
``auto_reset=False`` and a fused select-reset program swaps in fresh
episodes where ``terminated`` — the host only ever moves observations.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import gymnasium as gym
from gymnasium import spaces
from gymnasium.vector import AutoresetMode, VectorEnv

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.parallel.mesh import batch_keys
from tetris_gymnasium_tpu.rl.engines import env_fns


_PROGRAMS_CACHE: dict = {}


def _programs(config: EngineConfig, impl: str, num_envs: int, pieces=None):
    """(reset, step) jitted batched programs for the chosen engine.

    ``reset(base_key, epoch) -> (states, obs)``;
    ``step(states, actions, base_key, epoch) -> (states', obs', reward,
    terminated, final_obs, lines)`` where ``states'``/``obs'`` already
    contain the same-step restart for terminated envs and ``final_obs`` is
    the pre-restart terminal observation.  Per-env keys are derived INSIDE
    the program from the two scalars (fold_in on seed, epoch, global env
    index — the framework key discipline), so the host uploads one fixed
    key and a uint32 epoch per step, not a ``[B, 2]`` key array.
    """
    ck = (
        config, impl, num_envs,
        # every PieceSet field: sets with identical shapes but different
        # cell ids/colors must NOT share a closed-over program
        None if pieces is None else tuple(
            np.asarray(f).tobytes() for f in pieces
        ),
    )
    hit = _PROGRAMS_CACHE.get(ck)
    if hit is not None:
        return hit
    init, step, observe = env_fns(config, impl, pieces=pieces)

    def keys_for(base_key, epoch):
        # the framework key discipline (mesh.batch_keys), traced in-jit
        return batch_keys(jax.random.fold_in(base_key, epoch), num_envs)

    def reset_fn(base_key, epoch):
        states = init(keys_for(base_key, epoch))
        return states, observe(states)

    def step_fn(states, actions, base_key, epoch):
        states2, _, reward, done, info = step(states, actions)
        final_obs = observe(states2)
        # A full fresh init + a second full-batch observe run EVERY step,
        # terminations or not: the program is one fixed-shape trace, so the
        # common no-termination step pays for both.  Measured cost on the
        # turbo path: init ~70 µs and observe ~160 µs per launch at B=8192
        # (docs/scale/training_perf.md) vs ~175 µs for the step itself —
        # roughly 2x the pure-scan path per step, dwarfed in practice by
        # this adapter's host<->device numpy boundary.  If it ever shows in
        # a profile, seed one fresh init per reset() and reuse it with
        # per-env fold_in on a device step counter.
        fresh = init(keys_for(base_key, epoch))
        # batch-minor (turbo) leaves broadcast done on the last axis;
        # batch-leading (flagship vmap) on the first.
        def sel(a, b):
            if impl == "turbo":
                return jnp.where(done, a, b)
            cond = done.reshape((done.shape[0],) + (1,) * (a.ndim - 1))
            return jnp.where(cond, a, b)

        states3 = jax.tree.map(sel, fresh, states2)
        obs3 = observe(states3)
        return states3, obs3, reward, done, final_obs, info["lines_cleared"]

    out = (jax.jit(reset_fn), jax.jit(step_fn, donate_argnums=(0,)))
    _PROGRAMS_CACHE[ck] = out
    return out


class _KeyEpochs:
    """Host-side (base key, epoch) counter for the in-jit key derivation.

    The base key is built ONCE per (re)seed with ``jax.random.PRNGKey`` —
    which accepts 64-bit Python seeds — and passed as an array, so only the
    uint32 epoch scalar changes per step."""

    __slots__ = ("base_key", "epoch")

    def __init__(self, seed: int):
        self.base_key = jax.random.PRNGKey(seed)
        self.epoch = 0

    def next(self):
        e = self.epoch
        self.epoch += 1
        return self.base_key, jnp.uint32(e)


class TetrisVectorEnv(VectorEnv):
    """A ``gymnasium.vector.VectorEnv`` whose batch lives on a TPU/accelerator.

    Args:
        num_envs: batch size (thousands are cheap — one device program).
        config: engine geometry/behavior; ``auto_reset`` is ignored (the
            adapter owns the restart logic to produce terminal observations).
        impl: ``"turbo"`` (bit-packed hot path) or ``"flagship"``.
        seed: base seed for the per-env PRNG streams (fold_in on global
            env index, reproducible on any backend).
        tetrominoes: optional custom piece list (``components.Tetromino``),
            any matrix size — the OOP shell's ``tetrominoes`` kwarg
            (ref: envs/tetris.py:77-134); oversize boxes (>5x5) run on the
            turbo engine via its multi-word piece tables.  Overrides
            ``config.padding`` with the set's required padding.
    """

    metadata = {"autoreset_mode": AutoresetMode.SAME_STEP, "render_modes": []}

    def __init__(
        self,
        num_envs: int,
        config: EngineConfig = EngineConfig(),
        impl: str = "turbo",
        seed: int = 0,
        tetrominoes=None,
    ):
        config = config._replace(auto_reset=False)
        self._pieces = None
        if tetrominoes is not None:
            from tetris_gymnasium_tpu.components.tetromino import (
                pieces_from_tetrominoes,
            )

            self._pieces, pad = pieces_from_tetrominoes(tetrominoes)
            config = config._replace(padding=pad)
        self.num_envs = int(num_envs)
        self.config = config
        self.impl = impl
        self._keys = _KeyEpochs(seed)
        self._reset_fn, self._step_fn = _programs(
            config, impl, self.num_envs, self._pieces
        )
        self._states = None

        H, W = config.height, config.width
        self.single_observation_space = spaces.Box(
            low=-1, high=1, shape=(H, W), dtype=np.int8
        )
        self.single_action_space = spaces.Discrete(8)
        self.observation_space = spaces.Box(
            low=-1, high=1, shape=(self.num_envs, H, W), dtype=np.int8
        )
        self.action_space = spaces.MultiDiscrete([8] * self.num_envs)

    # -- VectorEnv API -------------------------------------------------------
    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is not None:
            self._keys = _KeyEpochs(seed)
        states, obs = self._reset_fn(*self._keys.next())
        self._states = states
        infos: dict = {}
        return np.asarray(obs), infos

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("call reset() before step()")
        actions = jnp.asarray(np.asarray(actions), dtype=jnp.int32)
        states, obs, reward, done, final_obs, lines = self._step_fn(
            self._states, actions, *self._keys.next()
        )
        self._states = states
        terminated = np.asarray(done)
        infos = {
            "lines_cleared": np.asarray(lines),
            "_lines_cleared": np.ones(self.num_envs, dtype=bool),
        }
        if terminated.any():
            # Gymnasium's SAME_STEP convention delivers final_obs as an
            # OBJECT array with None for non-terminated envs (consumers
            # write `final_obs[i] is not None` loops); a dense [B, H, W]
            # array would hand those loops a stale board for live envs.
            fo = np.asarray(final_obs)
            obj = np.full(self.num_envs, None, dtype=object)
            for i in np.nonzero(terminated)[0]:
                obj[i] = fo[i]
            infos["final_obs"] = obj
            infos["_final_obs"] = terminated
        return (
            np.asarray(obs),
            np.asarray(reward),
            terminated,
            np.zeros(self.num_envs, dtype=bool),  # no truncation (no step limit)
            infos,
        )

    def render(self):
        raise NotImplementedError(
            "use tetris_gymnasium_tpu.envs.gym_env or engine.render_rgb for rendering"
        )

    def close_extras(self, **kwargs):
        self._states = None
