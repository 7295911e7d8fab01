"""Batched on-device policy evaluation: N greedy episodes, one XLA program.

The reference DQN example evaluates a saved model with a host loop over one
env, collecting episodic returns (ref: examples/train_cnn.py:29-66).  Here
evaluation is the same fused machinery training uses: N fresh episodes step
in lockstep under the greedy policy with ``auto_reset=False``, so finished
games FREEZE (engine semantics, ref analog: tetris_fn.py:284-289) and the
engine state's own episodic accumulators — ``score`` (return), ``steps``
(length), ``lines`` — read out the statistics directly at the end.  No
per-episode host bookkeeping exists because none is needed.

Used by the three training examples via ``--eval-every`` (stats land in the
training JSONL) and standalone on a saved checkpoint.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import turbo_grouped
from tetris_gymnasium_tpu.ops import framestack
from tetris_gymnasium_tpu.parallel.mesh import batch_keys
from tetris_gymnasium_tpu.rl.engines import env_fns


def _stats(states, max_steps: int) -> dict:
    """Episodic statistics from frozen final states (device scalars)."""
    done = states.game_over
    n_done = jnp.sum(done.astype(jnp.int32))
    safe = jnp.maximum(n_done, 1).astype(jnp.float32)

    def masked_mean(x):
        return jnp.sum(jnp.where(done, x.astype(jnp.float32), 0.0)) / safe

    neg, pos = jnp.float32(-(2.0**30)), jnp.float32(2.0**30)
    any_done = n_done > 0  # fully-truncated evals must not leak the ±2^30 sentinels
    return {
        "episodes_completed": n_done,
        "completed_frac": n_done.astype(jnp.float32) / done.shape[0],
        "return_mean": masked_mean(states.score),
        "return_min": jnp.where(any_done, jnp.min(jnp.where(done, states.score, pos)), 0.0),
        "return_max": jnp.where(any_done, jnp.max(jnp.where(done, states.score, neg)), 0.0),
        "length_mean": masked_mean(states.steps),
        "lines_mean": masked_mean(states.lines),
        # envs alive at the cap bias the stats toward short episodes; the
        # caller sees how many and can raise max_steps
        "truncated": jnp.sum((~done).astype(jnp.int32)),
        "max_steps": jnp.int32(max_steps),
    }


def evaluate_policy(
    act: Callable[[jnp.ndarray], jnp.ndarray],
    n_episodes: int,
    env_config: EngineConfig,
    key: jnp.ndarray,
    impl: str = "turbo",
    max_steps: int = 2000,
    frame_stack: int = 1,
    obs: str = "board",
) -> dict:
    """Greedy-rollout statistics of ``act`` over ``n_episodes`` fresh games.

    ``act(obs) -> action[B]`` is the policy (e.g. argmax over Q-values or
    logits); it sees the same observation the training actor saw, including
    a ``[B, K, H, W]`` motion window when ``frame_stack > 1``.  Episodes run
    to termination (or ``max_steps``); returns a dict of device scalars —
    wrap in ``jax.jit`` once and reuse (act must be closure-jittable).
    """
    cfg = env_config._replace(auto_reset=False)
    init, step_b, observe = env_fns(cfg, impl, obs=obs)
    states = init(batch_keys(key, n_episodes))
    stack0 = (
        framestack.init(observe(states), frame_stack) if frame_stack > 1 else None
    )

    def body(carry, _):
        s, stack = carry
        obs = observe(s)
        action = act(stack if frame_stack > 1 else obs)
        s2, _, _, done, _ = step_b(s, action)
        if frame_stack > 1:
            stack = framestack.push(stack, observe(s2), done)
        return (s2, stack), None

    (final, _), _ = jax.lax.scan(
        body, (states, stack0), None, length=max_steps
    )
    return _stats(final, max_steps)


def evaluate_grouped(
    act: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    n_episodes: int,
    env_config: EngineConfig,
    key: jnp.ndarray,
    mode: str = "features",
    max_steps: int = 512,
) -> dict:
    """Greedy placement-policy statistics on the turbo grouped engine.

    ``act(obs, mask) -> action[B]`` scores all ``width*4`` candidates (mask
    is ``[B, A]``, 1 = legal).  Illegal selections terminate (reference
    grouped semantics); frozen finished games read out episodic stats like
    :func:`evaluate_policy`.
    """
    cfg = env_config._replace(auto_reset=False)
    gstates, obs = turbo_grouped.reset(batch_keys(key, n_episodes), cfg, mode=mode)

    def body(carry, _):
        gs, obs = carry
        action = act(obs, jnp.transpose(gs.mask))
        gs2, obs2, _, _, _ = turbo_grouped.step(gs, action, cfg, mode=mode)
        return (gs2, obs2), None

    (final, _), _ = jax.lax.scan(body, (gstates, obs), None, length=max_steps)
    return _stats(final.env, max_steps)


def greedy_q(net, params) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Policy from a Q-network: argmax over action values."""
    def act(obs):
        return jnp.argmax(net.apply(params, obs), axis=-1).astype(jnp.int32)

    return act


def greedy_logits(net, params) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Policy from an actor-critic: argmax over policy logits."""
    def act(obs):
        logits, _ = net.apply(params, obs)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return act


def greedy_masked_q(net, params) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Grouped policy: argmax of per-candidate scores over legal candidates."""
    def act(obs, mask):
        q = net.apply(params, obs)  # [B, A]
        q = jnp.where(mask > 0, q, -jnp.inf)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    return act


@functools.partial(jax.jit, static_argnames=("net", "n_episodes", "env_config",
                                             "impl", "max_steps", "frame_stack",
                                             "obs"))
def _jit_eval_q(net, params, n_episodes, env_config, key, impl, max_steps,
                frame_stack, obs="board"):
    return evaluate_policy(
        greedy_q(net, params), n_episodes, env_config, key,
        impl=impl, max_steps=max_steps, frame_stack=frame_stack, obs=obs,
    )


def evaluate_q_checkpoint(
    net,
    params,
    n_episodes: int,
    env_config: EngineConfig,
    seed: int = 0,
    impl: str = "turbo",
    max_steps: int = 2000,
    frame_stack: int = 1,
    obs: str = "board",
) -> dict:
    """Host-friendly wrapper: evaluate a Q-net checkpoint, return floats."""
    out = _jit_eval_q(
        net, params, n_episodes, env_config, jax.random.PRNGKey(seed),
        impl, max_steps, frame_stack, obs,
    )
    return {k: float(v) for k, v in jax.device_get(out).items()}
