"""Piece-queue RNG ops: 7-bag and uniform samplers.

Two modes:
  * **compat** — reproduces the reference functional queue's exact key
    threading (ref: tetris_gymnasium/functional/queue.py) so fixed-seed
    trajectories are bit-identical.  These are branch-free re-writes: the
    refill ``lax.cond`` becomes compute-both-and-select, which is what XLA
    lowers a vmapped cond to anyway and yields the same selected values.
  * **native** (in core/engine.py) — per-env folded keys + a preview queue,
    matching the OOP env's feature set.

Both queue flavours are pluggable via the ``QueueFns`` pair, mirroring the
reference's ``CreateQueueFunction``/``QueueFunction`` strategy aliases
(ref: functional/queue.py:12-16).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EnvConfig

# (config, key) -> (queue, queue_index)
CreateQueueFn = Callable[[EnvConfig, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
# (config, queue, queue_index, key) -> (piece, queue, queue_index, key)
NextPieceFn = Callable[
    [EnvConfig, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
]


class QueueFns(NamedTuple):
    """A pluggable queue strategy: how to create and how to draw."""

    create: CreateQueueFn
    next_piece: NextPieceFn


def create_bag(config: EnvConfig, key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fresh 7-bag: a random permutation of all piece indices.

    Ref parity: functional/queue.py:20-35 (``queue_size`` doubles as the
    number of distinct pieces — reference quirk, kept for compat).
    """
    return jax.random.permutation(key, jnp.arange(config.queue_size)), jnp.int32(0)


def bag_next(
    config: EnvConfig,
    queue: jnp.ndarray,
    queue_index: jnp.ndarray,
    key: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw the next piece from the bag, reshuffling when exhausted.

    Bit-exact with the reference's ``lax.cond`` version
    (ref: functional/queue.py:38-67): on refill the key splits into
    (new_key, subkey), the new bag is permuted with ``subkey`` and the
    returned key is ``new_key``; otherwise the key passes through untouched.
    Written branch-free: both branches are cheap, so compute-and-select beats
    divergent control flow on the VPU.
    """
    refill = queue_index >= config.queue_size
    new_key, subkey = jax.random.split(key)
    fresh_queue, _ = create_bag(config, subkey)

    out_queue = jnp.where(refill, fresh_queue, queue)
    idx = jnp.where(refill, 0, queue_index)
    piece = out_queue[idx]
    out_key = jnp.where(refill, new_key, key)
    return piece, out_queue, idx + 1, out_key


def create_uniform(config: EnvConfig, key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform random queue.

    Ref parity: functional/queue.py:71-87 — including the reference's
    off-by-one ``randint(0, queue_size - 1)`` upper bound, which samples only
    pieces 0..queue_size-2 (the last piece never appears).  Kept verbatim for
    trajectory compat; use the native engine's sampler for a correct uniform.
    """
    return (
        jax.random.randint(key, (config.queue_size,), 0, config.queue_size - 1),
        jnp.int32(0),
    )


def uniform_next(
    config: EnvConfig,
    queue: jnp.ndarray,
    queue_index: jnp.ndarray,
    key: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw from the uniform queue, refilling when exhausted.

    Ref parity: functional/queue.py:90-119, same key discipline as
    :func:`bag_next`.
    """
    refill = queue_index >= config.queue_size
    new_key, subkey = jax.random.split(key)
    fresh_queue, _ = create_uniform(config, subkey)

    out_queue = jnp.where(refill, fresh_queue, queue)
    idx = jnp.where(refill, 0, queue_index)
    piece = out_queue[idx]
    out_key = jnp.where(refill, new_key, key)
    return piece, out_queue, idx + 1, out_key


BAG_QUEUE = QueueFns(create=create_bag, next_piece=bag_next)
UNIFORM_QUEUE = QueueFns(create=create_uniform, next_piece=uniform_next)
