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


@functools.lru_cache(maxsize=None)
def _programs(config: EngineConfig, impl: str):
    """(reset, step) jitted batched programs for the chosen engine.

    ``reset(keys) -> (states, obs)``;
    ``step(states, actions, reset_keys) -> (states', obs', reward,
    terminated, final_obs, lines)`` where ``states'``/``obs'`` already
    contain the same-step restart for terminated envs and ``final_obs`` is
    the pre-restart terminal observation.
    """
    init, step, observe = env_fns(config, impl)

    def reset_fn(keys):
        states = init(keys)
        return states, observe(states)

    def step_fn(states, actions, reset_keys):
        states2, _, reward, done, info = step(states, actions)
        final_obs = observe(states2)
        fresh = init(reset_keys)
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

    return jax.jit(reset_fn), jax.jit(step_fn, donate_argnums=(0,))


class TetrisVectorEnv(VectorEnv):
    """A ``gymnasium.vector.VectorEnv`` whose batch lives on a TPU/accelerator.

    Args:
        num_envs: batch size (thousands are cheap — one device program).
        config: engine geometry/behavior; ``auto_reset`` is ignored (the
            adapter owns the restart logic to produce terminal observations).
        impl: ``"turbo"`` (bit-packed hot path) or ``"flagship"``.
        seed: base seed for the per-env PRNG streams (fold_in on global
            env index, reproducible on any backend).
    """

    metadata = {"autoreset_mode": AutoresetMode.SAME_STEP, "render_modes": []}

    def __init__(
        self,
        num_envs: int,
        config: EngineConfig = EngineConfig(),
        impl: str = "turbo",
        seed: int = 0,
    ):
        config = config._replace(auto_reset=False)
        self.num_envs = int(num_envs)
        self.config = config
        self.impl = impl
        self._base_seed = seed
        self._reset_epoch = 0  # bumped per key request => unique streams
        self._reset_fn, self._step_fn = _programs(config, impl)
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

    # -- key discipline ------------------------------------------------------
    def _fresh_keys(self) -> jnp.ndarray:
        """Per-env keys ``uint32[B, 2]``, a new stream block every call
        (the framework-wide fold-on-global-index discipline, mesh.batch_keys)."""
        base = jax.random.fold_in(
            jax.random.PRNGKey(self._base_seed), self._reset_epoch
        )
        self._reset_epoch += 1
        return batch_keys(base, self.num_envs)

    # -- VectorEnv API -------------------------------------------------------
    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is not None:
            self._base_seed = seed
            self._reset_epoch = 0
        states, obs = self._reset_fn(self._fresh_keys())
        self._states = states
        infos: dict = {}
        return np.asarray(obs), infos

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("call reset() before step()")
        actions = jnp.asarray(np.asarray(actions), dtype=jnp.int32)
        states, obs, reward, done, final_obs, lines = self._step_fn(
            self._states, actions, self._fresh_keys()
        )
        self._states = states
        terminated = np.asarray(done)
        infos = {
            "lines_cleared": np.asarray(lines),
            "_lines_cleared": np.ones(self.num_envs, dtype=bool),
        }
        if terminated.any():
            infos["final_obs"] = np.asarray(final_obs)
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
