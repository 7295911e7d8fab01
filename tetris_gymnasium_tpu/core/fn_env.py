"""Compat functional engine: bit-exact with the reference ``tetris_fn``.

This module is the *parity path*: given the same PRNG key and action sequence
it produces byte-identical boards, scores, observations and termination flags
to the reference functional env (ref: tetris_gymnasium/envs/tetris_fn.py),
including its quirks (7-action numbering with no swap, reward = score delta,
queue-key threading, piece-independent spawn column).

It is *not* a translation: the reference's three ``lax.switch`` tables and
nested ``lax.cond``s (ref: tetris_fn.py:161-273) are re-designed as straight-
line masked arithmetic — the natural TPU form, since under vmap every lane
executes every branch anyway — and the ``while_loop`` hard drop is closed-form
(see ops/board.py).  Use :mod:`tetris_gymnasium_tpu.core.engine` for the
feature-complete flagship engine.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tetris_gymnasium_tpu.config import EnvConfig
from tetris_gymnasium_tpu.ops.board import (
    clear_lines_compat,
    collision,
    create_board,
    drop_distance,
    gravity_step,
    project,
    score_fn,
    spawn_xy_fn,
)
from tetris_gymnasium_tpu.ops.queue import BAG_QUEUE, QueueFns
from tetris_gymnasium_tpu.pieces import PIECES, PieceSet, piece_matrix
from tetris_gymnasium_tpu.utils.tree import select_tree

# Compat action ids (ref: tetris_fn.py:470-478).
LEFT, RIGHT, DOWN, CCW, CW, NOOP, HARD_DROP = range(7)


@struct.dataclass
class FnState:
    """Per-env state pytree of the compat engine.

    Mirrors the reference ``State`` (ref: functional/core.py:28-42) field for
    field so checkpoints and parity comparisons are direct.
    """

    rng_key: jnp.ndarray  # uint32[2]
    board: jnp.ndarray  # int8 [H+pad, W+2pad]
    piece: jnp.ndarray  # int32 — index of the active tetromino (0..6)
    rotation: jnp.ndarray  # int32 (0..3)
    x: jnp.ndarray  # int32
    y: jnp.ndarray  # int32
    queue: jnp.ndarray  # int32 [queue_size]
    queue_index: jnp.ndarray  # int32
    game_over: jnp.ndarray  # bool
    score: jnp.ndarray  # float32


def observe(
    state: FnState, config: EnvConfig, pieces: PieceSet = PIECES
) -> jnp.ndarray:
    """Cropped board observation with the active piece stamped as -1.

    Ref parity: tetris_fn.py:137-158 — binarise the board to {0, 1} int8,
    project the active piece with cell id -1 unless the game is over, then
    crop the bedrock frame.
    """
    binary = jnp.where(state.board > 0, 1, 0).astype(jnp.int8)
    mat = piece_matrix(pieces, state.piece, state.rotation)
    projected = project(binary, mat, state.x, state.y, jnp.int8(-1))
    out = jnp.where(state.game_over, binary, projected)
    return out[: -config.padding, config.padding : -config.padding]


def _lock_piece(
    state: FnState,
    y_final: jnp.ndarray,
    x: jnp.ndarray,
    rotation: jnp.ndarray,
    config: EnvConfig,
    pieces: PieceSet,
    queue_fns: QueueFns,
) -> Tuple[FnState, jnp.ndarray, jnp.ndarray]:
    """Lock the active piece, clear lines, spawn the next piece.

    Ref parity: tetris_fn.py:370-413 (``place_active_tetromino``): the queue
    draw consumes ``state.rng_key`` and its returned key is *discarded*; the
    state's next key is ``split(rng_key)[0]`` — a reference quirk that must be
    reproduced for fixed-seed parity.
    """
    mat = piece_matrix(pieces, state.piece, rotation)
    stamped = project(state.board, mat, x, y_final, jnp.asarray(pieces.ids)[state.piece])
    new_board, lines = clear_lines_compat(stamped, config.height, config.width, config.padding)
    lock_reward = score_fn(lines)

    new_piece, new_queue, new_qi, _ = queue_fns.next_piece(
        config, state.queue, state.queue_index, state.rng_key
    )
    sx, sy = spawn_xy_fn(config)
    sx, sy = jnp.int32(sx), jnp.int32(sy)
    spawn_mat = piece_matrix(pieces, new_piece, jnp.int32(0))
    game_over = collision(new_board, spawn_mat, sx, sy)
    new_rng = jax.random.split(state.rng_key)[0]

    new_state = state.replace(
        rng_key=new_rng,
        board=new_board,
        piece=jnp.int32(new_piece),
        rotation=jnp.int32(0),
        x=sx,
        y=sy,
        queue=new_queue,
        queue_index=new_qi,
        game_over=game_over,
    )
    return new_state, lock_reward, lines


def _update(
    state: FnState,
    action: jnp.ndarray,
    config: EnvConfig,
    pieces: PieceSet,
    queue_fns: QueueFns,
) -> Tuple[FnState, jnp.ndarray]:
    """One action application, branch-free.

    Order of effects matches the reference switch cascade
    (ref: tetris_fn.py:161-273): horizontal move first (old rotation), then
    vertical move / hard drop (old rotation, new x), then rotation (checked at
    the new position), then gravity (new rotation), then lock-and-respawn.
    """
    board = state.board
    x, y, rotation = state.x, state.y, state.rotation
    mat = piece_matrix(pieces, state.piece, rotation)

    # Horizontal move.
    dx = jnp.where(action == LEFT, -1, jnp.where(action == RIGHT, 1, 0))
    x_cand = x + dx
    x_ok = ~collision(board, mat, x_cand, y)
    x = jnp.where((dx != 0) & x_ok, x_cand, x)

    # Vertical move / hard drop (evaluated at the updated x).
    down_free = ~collision(board, mat, x, y + 1)
    y_down = jnp.where(down_free, y + 1, y)
    dist = drop_distance(board, mat, x, y)
    y_new = jnp.where(action == DOWN, y_down, jnp.where(action == HARD_DROP, y + dist, y))
    move_reward = jnp.where(
        action == DOWN,
        (y_down - y).astype(jnp.int32),
        jnp.where(action == HARD_DROP, 2 * dist, 0),
    )

    # Rotation (checked at the updated x / y).
    rot_dir = jnp.where(action == CCW, -1, jnp.where(action == CW, 1, 0))
    rot_cand = jnp.mod(rotation + rot_dir, 4)
    mat_cand = piece_matrix(pieces, state.piece, rot_cand)
    rot_ok = ~collision(board, mat_cand, x, y_new)
    rotation = jnp.where((rot_dir != 0) & rot_ok, rot_cand, rotation)
    mat = piece_matrix(pieces, state.piece, rotation)

    # Gravity (static flag — dead code is compiled out when disabled).
    if config.gravity_enabled:
        y_grav = gravity_step(board, mat, x, y_new)
        should_lock = y_grav == y_new
    else:
        y_grav = y_new
        should_lock = jnp.bool_(False)

    moved = state.replace(x=x, y=y_grav, rotation=rotation, game_over=jnp.bool_(False))

    lock = should_lock | (action == HARD_DROP)
    locked_state, lock_reward, lock_lines = _lock_piece(
        state, y_grav, x, rotation, config, pieces, queue_fns
    )
    new_state = select_tree(lock, locked_state, moved)
    lock_reward = jnp.where(lock, lock_reward, 0)
    lines = jnp.where(lock, lock_lines, 0)

    new_state = new_state.replace(score=new_state.score + move_reward + lock_reward)
    return new_state, lines


def step(
    state: FnState,
    action: jnp.ndarray,
    config: EnvConfig,
    pieces: PieceSet = PIECES,
    queue_fns: QueueFns = BAG_QUEUE,
) -> Tuple[FnState, jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """One env step: (state, action) -> (state, obs, reward, terminated, info).

    Ref parity: tetris_fn.py:276-315 — a finished game freezes (the state
    passes through unchanged) and reward is the score delta.
    """
    updated, lines = _update(state, action, config, pieces, queue_fns)
    new_state = select_tree(state.game_over, state, updated)
    lines = jnp.where(state.game_over, 0, lines)

    obs = observe(new_state, config, pieces)
    reward = new_state.score - state.score
    return new_state, obs, reward, new_state.game_over, {"lines_cleared": lines}


def reset(
    key: jnp.ndarray,
    config: EnvConfig,
    pieces: PieceSet = PIECES,
    queue_fns: QueueFns = BAG_QUEUE,
) -> Tuple[jnp.ndarray, FnState, jnp.ndarray]:
    """Fresh episode: -> (key, state, obs).

    Ref parity: tetris_fn.py:318-367 including its key discipline: the input
    key is split once; the *first* half seeds the bag permutation and is also
    returned to the caller, the second half becomes the state's stream.
    """
    board = create_board(config.height, config.width, config.padding)

    key, subkey = jax.random.split(key)
    queue, queue_index = queue_fns.create(config, key)
    piece, queue, queue_index, key = queue_fns.next_piece(
        config, queue, queue_index, key
    )

    sx, sy = spawn_xy_fn(config)
    state = FnState(
        rng_key=subkey,
        board=board,
        piece=jnp.int32(piece),
        rotation=jnp.int32(0),
        x=jnp.int32(sx),
        y=jnp.int32(sy),
        queue=queue,
        queue_index=jnp.int32(queue_index),
        game_over=jnp.bool_(False),
        score=jnp.float32(0),
    )
    return key, state, observe(state, config, pieces)


@functools.lru_cache(maxsize=None)
def _batched_fns(config: EnvConfig):
    """Module-level cached (jit ∘ vmap) step/reset for the default piece set.

    The reference re-wraps ``jax.jit`` on every Python call
    (ref: tetris_fn.py:416-467) which re-traces each time; caching on the
    static config gives one compile per config for the process lifetime.
    Donation is deliberately *not* enabled here (callers may hold the input
    state); the bench/rollout paths use their own donating jits.
    """
    step_b = jax.jit(jax.vmap(functools.partial(step, config=config)))
    reset_b = jax.jit(jax.vmap(functools.partial(reset, config=config)))
    return step_b, reset_b


@functools.lru_cache(maxsize=None)
def jit_step(config: EnvConfig):
    """Cached single-env jitted step for the default piece set."""
    return jax.jit(functools.partial(step, config=config))


@functools.lru_cache(maxsize=None)
def jit_reset(config: EnvConfig):
    """Cached single-env jitted reset for the default piece set."""
    return jax.jit(functools.partial(reset, config=config))


def rollout(
    state: FnState,
    actions: jnp.ndarray,
    config: EnvConfig,
    pieces: PieceSet = PIECES,
    queue_fns: QueueFns = BAG_QUEUE,
):
    """Scan a whole action sequence through the env in one XLA program.

    Returns the final state and the stacked per-step
    (obs, reward, terminated, lines_cleared).  Works single-env or batched
    (actions ``[T]`` or ``[T, B]``) — the step is vmapped if a batch axis is
    present on the state.
    """
    batched = state.board.ndim == 3

    def one(carry, action):
        if batched:
            s, o, r, t, info = jax.vmap(
                lambda cs, ca: step(cs, ca, config, pieces, queue_fns)
            )(carry, action)
        else:
            s, o, r, t, info = step(carry, action, config, pieces, queue_fns)
        return s, (o, r, t, info["lines_cleared"])

    return jax.lax.scan(one, state, actions)


def batched_step(
    states: FnState, actions: jnp.ndarray, *, config: EnvConfig
) -> Tuple[FnState, jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """vmap+jit step over a leading env-batch axis (donates the state buffers)."""
    return _batched_fns(config)[0](states, actions)


def batched_reset(
    keys: jnp.ndarray, *, config: EnvConfig
) -> Tuple[jnp.ndarray, FnState, jnp.ndarray]:
    """vmap+jit reset over a batch of PRNG keys ``[B, 2]``."""
    return _batched_fns(config)[1](keys)
