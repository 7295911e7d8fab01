"""On-device frame stacking: motion history without storing frames twice.

The reference CNN workload wraps the env in ``FrameStack(4)`` so the policy
sees a short motion history (ref: examples/train_cnn.py:127-147) — a
host-side deque of numpy frames.  Here the stack is a rolling
``[B, K, H, W]`` device window (K static) with Gymnasium FrameStack reset
semantics (a fresh episode's stack is its first observation repeated K
times), maintained by two pure functions that fuse into the actor step:

- :func:`init` builds the reset stack from a batch of first observations;
- :func:`push` rolls the newest frame in, re-initializing lanes whose
  episode just restarted (``done``).

Axis order: ``stack[:, 0]`` is the OLDEST frame, ``stack[:, -1]`` the
newest — the order a channels-last conv consumes after ``moveaxis``.

Replay does NOT store stacks: :func:`tetris_gymnasium_tpu.rl.buffers.sample_with_next_stacked`
reconstructs the exact online stack at sample time from single stored
frames (the same-env entry ``batch`` steps earlier is the previous frame),
so a K=4 stack costs 1x frame memory where the reference's SB3 buffer
stores each frame ~2K times (K per stack, stacks duplicated in obs and
next_obs, ref: train_cnn.py:266-272).
"""
from __future__ import annotations

import jax.numpy as jnp


def init(obs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reset stack: ``[B, H, W] -> [B, K, H, W]``, first obs repeated K times.

    Gymnasium FrameStack reset parity (the reference workload's wrapper).
    """
    return jnp.repeat(obs[:, None], k, axis=1)


def push(stack: jnp.ndarray, obs: jnp.ndarray, done: jnp.ndarray) -> jnp.ndarray:
    """Roll ``obs`` in as the newest frame; restart lanes where ``done``.

    ``done`` marks envs whose step just terminated — under auto-reset their
    ``obs`` is the NEXT episode's first observation, so their window resets
    to ``init`` semantics instead of leaking frames across the boundary.
    """
    rolled = jnp.concatenate([stack[:, 1:], obs[:, None]], axis=1)
    fresh = init(obs, stack.shape[1])
    return jnp.where(done.reshape((-1,) + (1,) * (stack.ndim - 1)), fresh, rolled)
