"""On-device replay buffer: a struct-of-arrays pytree in HBM.

The reference uses stable-baselines3's host-RAM ReplayBuffer with per-step
numpy copies (ref: examples/train_cnn.py:266-272, 317).  Here the buffer is a
device-resident pytree updated inside the jitted train step — writes are
``dynamic_update_slice`` (the whole env batch lands as one contiguous block),
reads are random gathers, and no transition ever crosses the host boundary.

Capacity must be a multiple of the env batch so every add is one contiguous
slice (a static requirement checked at construction).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    """Circular struct-of-arrays buffer; ``data`` is any transition pytree."""

    data: Any  # pytree of [capacity, ...] arrays
    pos: jnp.ndarray  # int32 next write offset (multiple of batch)
    size: jnp.ndarray  # int32 number of valid entries


def create(example: Any, capacity: int, batch: int) -> ReplayBuffer:
    """Allocate a buffer shaped after one *batched* transition pytree.

    Args:
        example: pytree of ``[batch, ...]`` arrays (one env-batch step).
        capacity: total entries; must be a multiple of ``batch``.
        batch: env batch size (entries added per step).
    """
    if capacity % batch != 0:
        raise ValueError(f"capacity {capacity} must be a multiple of batch {batch}")
    data = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + x.shape[1:], dtype=x.dtype), example
    )
    return ReplayBuffer(data=data, pos=jnp.int32(0), size=jnp.int32(0))


def add(buffer: ReplayBuffer, transitions: Any) -> ReplayBuffer:
    """Append one env-batch of transitions (donation-friendly, in-place)."""
    batch = jax.tree.leaves(transitions)[0].shape[0]
    capacity = jax.tree.leaves(buffer.data)[0].shape[0]
    start = buffer.pos

    data = jax.tree.map(
        lambda store, x: jax.lax.dynamic_update_slice(
            store, x.astype(store.dtype), (start,) + (0,) * (store.ndim - 1)
        ),
        buffer.data,
        transitions,
    )
    pos = jnp.mod(start + batch, capacity)
    size = jnp.minimum(buffer.size + batch, capacity)
    return ReplayBuffer(data=data, pos=pos, size=size)


def sample(buffer: ReplayBuffer, key: jnp.ndarray, batch_size: int) -> Any:
    """Uniform sample of ``batch_size`` transitions (gather over valid entries)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buffer.size, 1))
    return jax.tree.map(lambda x: x[idx], buffer.data)


def sample_with_next(
    buffer: ReplayBuffer, key: jnp.ndarray, batch_size: int, batch: int
) -> Any:
    """Uniform sample returning each transition AND its successor entry.

    Lets a DQN buffer store each observation ONCE: entry ``i``'s next
    observation is entry ``i + batch``'s observation (the same env one step
    later), halving replay memory and write bandwidth versus duplicating
    ``next_obs`` per transition (the SB3/reference layout,
    ref: examples/train_cnn.py:266-272).

    Correctness of the successor link in the circular layout: entries are
    overwritten oldest-first, so for every valid entry outside the NEWEST
    block, the entry one block later is strictly newer and still resident.
    The newest block (whose successor is not yet in the buffer) is excluded
    from sampling.

    Returns ``(transitions, next_transitions)`` pytrees shaped
    ``[batch_size, ...]``.
    """
    capacity = jax.tree.leaves(buffer.data)[0].shape[0]
    if capacity < 2 * batch:
        # with a single block, the "successor" of an entry is itself
        raise ValueError(
            f"sample_with_next needs capacity >= 2*batch "
            f"(got {capacity} < 2*{batch})"
        )
    full = buffer.size == capacity
    start = jnp.where(full, buffer.pos, 0)  # oldest entry's position
    # callers must not sample before two blocks are resident (size > batch);
    # the max(1) only keeps randint's bound legal while a learn gate holds
    n_valid = jnp.maximum(buffer.size - batch, 1)
    off = jax.random.randint(key, (batch_size,), 0, n_valid)
    idx = jnp.mod(start + off, capacity)
    nxt = jnp.mod(idx + batch, capacity)
    return (
        jax.tree.map(lambda x: x[idx], buffer.data),
        jax.tree.map(lambda x: x[nxt], buffer.data),
    )


def sample_with_next_stacked(
    buffer: ReplayBuffer,
    key: jnp.ndarray,
    batch_size: int,
    batch: int,
    k: int,
    obs_key: str = "obs",
    done_key: str = "done",
) -> Any:
    """:func:`sample_with_next` whose observations come back as K-frame
    stacks ``[batch_size, K, ...]`` — reconstructed, not stored.

    The circular block layout makes the same env's previous frame available
    ``batch`` entries earlier, so a transition's online frame stack
    (:mod:`tetris_gymnasium_tpu.ops.framestack` semantics: oldest-first,
    fresh episodes repeat their first frame) is rebuilt at gather time from
    single stored frames.  Replay holds each frame ONCE; the reference's
    SB3 buffer stores every frame ~2K times (K per stack, stacks duplicated
    across obs/next_obs, ref: examples/train_cnn.py:266-272).

    Episode boundaries: for an anchor entry at step ``t``, the lookback
    frame ``obs[t-j]`` belongs to the current episode iff no ``done`` fired
    in transitions ``t-j .. t-1``; deeper slots clamp to the episode's
    first frame (exactly Gymnasium FrameStack's repeat-on-reset).  Sampling
    excludes the oldest ``k-1`` blocks so the full lookback window is
    resident — callers must not sample before ``k+1`` blocks are in the
    buffer (DQN gates on ``step >= max(learning_starts, k)``).
    """
    capacity = jax.tree.leaves(buffer.data)[0].shape[0]
    if capacity < (k + 1) * batch:
        raise ValueError(
            f"sample_with_next_stacked needs capacity >= (k+1)*batch "
            f"(got {capacity} < {(k + 1) * batch})"
        )
    full = buffer.size == capacity
    start = jnp.where(full, buffer.pos, 0)
    n_valid = jnp.maximum(buffer.size - k * batch, 1)
    off = (k - 1) * batch + jax.random.randint(key, (batch_size,), 0, n_valid)
    idx = jnp.mod(start + off, capacity)
    nxt = jnp.mod(idx + batch, capacity)

    obs_store = buffer.data[obs_key]
    done_store = buffer.data[done_key]

    def stack_at(anchor: jnp.ndarray) -> jnp.ndarray:
        """Online-exact stack for the obs stored AT ``anchor`` entries."""
        js = jnp.arange(k, dtype=jnp.int32)  # lookback depth, newest first
        # d[:, j-1] = done of transition (t-j -> t-j+1); a set flag means
        # every deeper frame belongs to a previous episode
        d_idx = jnp.mod(anchor[:, None] - js[None, 1:] * batch, capacity)
        boundary = jnp.cumsum(done_store[d_idx].astype(jnp.int32), axis=1) > 0
        m = jnp.sum(~boundary, axis=1)  # valid lookback depth per sample
        jeff = jnp.minimum(js[None, :], m[:, None])  # clamp to episode start
        frames = obs_store[jnp.mod(anchor[:, None] - jeff * batch, capacity)]
        return frames[:, ::-1]  # newest-first -> oldest-first (framestack order)

    cur = jax.tree.map(lambda x: x[idx], buffer.data)
    nxt_t = jax.tree.map(lambda x: x[nxt], buffer.data)
    cur = {**cur, obs_key: stack_at(idx)}
    nxt_t = {**nxt_t, obs_key: stack_at(nxt)}
    return cur, nxt_t
