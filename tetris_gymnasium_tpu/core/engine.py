"""Flagship engine: the full-featured, batched, TPU-native Tetris core.

Feature parity with the reference *OOP* environment (holder/swap, preview
queue fed by a 7-bag, gravity commits, ``(lines**2) * width`` scoring,
8-action space — ref: tetris_gymnasium/envs/tetris.py) in a pure-functional
form the reference only provides for its reduced 7-action engine.  This is
the engine the Gymnasium shell, the wrappers and the RL stack all build on.

Design (TPU-first):
  * one straight-line masked program per step — no lax.switch/cond trees;
    all candidate outcomes (move / rotate / swap / commit) are computed and
    selected by action masks, which is exactly what XLA lowers vmapped
    control flow to anyway;
  * per-env independent PRNG stream carried in the state (no cross-env key
    threading), so an env batch shards freely over a device mesh;
  * optional on-device auto-reset so rollouts never sync with the host
    (the reference freezes finished games and requires a host-side reset,
    ref: tetris_fn.py:284-289).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig, RewardsMapping
from tetris_gymnasium_tpu.ops import bitboard as bb
from tetris_gymnasium_tpu.ops import bitboard_wide as bbw
from tetris_gymnasium_tpu.ops import rng as orng
from tetris_gymnasium_tpu.ops.board import (
    collision,
    create_board,
    project,
    spawn_x_classic,
)
from tetris_gymnasium_tpu.pieces import PIECES, PieceSet, piece_matrix
from tetris_gymnasium_tpu.utils.tree import select_tree

ACTIONS = ActionsMapping()
REWARDS = RewardsMapping()


def _kb(config: EngineConfig):
    """Bit-kernel module for this geometry, selected at trace time.

    Boards whose padded rows fit one uint32 word use :mod:`ops.bitboard`
    (the headline hot path, byte-identical to before wide-board support);
    wider boards — any geometry the reference OOP env accepts
    (ref: envs/tetris.py:77-107) — use the multi-word
    :mod:`ops.bitboard_wide` with the same API over ``uint32[H, NW]`` rows.
    """
    return bb if config.padded_width <= 32 else bbw


def piece_box(pieces: PieceSet, piece: jnp.ndarray) -> jnp.ndarray:
    """Bounding-box side of ``piece`` — one-hot over the 7-entry constant
    table (a vmapped scalar gather would serialise; this is 7 multiply-adds)."""
    box = jnp.asarray(pieces.box, dtype=jnp.int32)
    return jnp.sum(jnp.where(jnp.arange(box.shape[0]) == piece, box, 0))


def piece_id(pieces: PieceSet, piece: jnp.ndarray) -> jnp.ndarray:
    """Cell id of ``piece`` — one-hot over the constant id table."""
    ids = jnp.asarray(pieces.ids, dtype=jnp.int32)
    return jnp.sum(jnp.where(jnp.arange(ids.shape[0]) == piece, ids, 0)).astype(jnp.int8)


@struct.dataclass
class EngineState:
    """Per-env state of the flagship engine (a pytree; vmap/shard over axis 0)."""

    key: jnp.ndarray  # uint32[2] per-env PRNG stream
    board: jnp.ndarray  # int8 [H+pad, W+2pad]
    piece: jnp.ndarray  # int32 active piece index (0..6)
    rotation: jnp.ndarray  # int32 (0..3)
    x: jnp.ndarray  # int32
    y: jnp.ndarray  # int32
    bag: jnp.ndarray  # int32 [7] current 7-bag permutation
    bag_index: jnp.ndarray  # int32 position in the bag
    queue: jnp.ndarray  # int32 [queue_size] preview pieces
    holder_piece: jnp.ndarray  # int32 [holder_size], slot content (undefined beyond count)
    holder_rotation: jnp.ndarray  # int32 [holder_size] stored orientations
    holder_count: jnp.ndarray  # int32 number of filled holder slots
    has_swapped: jnp.ndarray  # bool swap already used for this piece
    game_over: jnp.ndarray  # bool
    score: jnp.ndarray  # float32 cumulative episode reward
    lines: jnp.ndarray  # int32 cumulative lines cleared this episode
    steps: jnp.ndarray  # int32 episode length


# ---------------------------------------------------------------------------
# Bag / preview queue
# ---------------------------------------------------------------------------


def _draw(config: EngineConfig):
    """Select the randomizer at trace time (queue_kind is static config).

    Strategies are pure draw functions from the component registry
    (:mod:`tetris_gymnasium_tpu.components.tetromino_randomizer`): "bag" and
    "uniform" are built in (the reference's BagRandomizer / TrueRandomizer,
    ref: components/tetromino_randomizer.py:49-136); users add their own with
    ``register_randomizer``.
    """
    from tetris_gymnasium_tpu.components.tetromino_randomizer import get_draw_fn

    return get_draw_fn(config.queue_kind)


def _queue_draw(queue, bag, bag_index, key, config: EngineConfig):
    """Pop the preview queue head and backfill from the randomizer.

    Semantics of TetrominoQueue.get_next_tetromino
    (ref: components/tetromino_queue.py:35-42): FIFO pop + immediate refill so
    the preview is always full.
    """
    piece = queue[0]
    refill, bag, bag_index, key = _draw(config)(bag, bag_index, key)
    queue = jnp.roll(queue, -1).at[-1].set(refill)
    return piece, queue, bag, bag_index, key


# ---------------------------------------------------------------------------
# Reset
# ---------------------------------------------------------------------------


def init_state(key: jnp.ndarray, config: EngineConfig, pieces: PieceSet = PIECES) -> EngineState:
    """Fresh episode state from one per-env RNG state (``uint32[2]``).

    ``key`` is the engine's counter-based RNG state (:mod:`ops.rng`); a
    legacy ``jax.random.PRNGKey`` / ``fold_in`` product seeds it directly.
    Runs on the auto-reset hot path, so draws are specialised at trace time:
    with a bag randomizer and ``queue_size + 1`` pieces available in a fresh
    bag, the draws are direct bag reads (no refill logic).
    """
    n_pieces = int(pieces.ids.shape[0])
    pieces = pieces.jx()
    carry_key = jnp.asarray(key, dtype=jnp.uint32)
    carry_key, bag = orng.shuffle(carry_key, n_pieces)
    bag_index = jnp.int32(0)

    if config.queue_kind == "bag" and config.queue_size + 1 <= n_pieces:
        # fresh bag covers active + preview: draws are static bag slots
        active = bag[0]
        queue = bag[1 : 1 + config.queue_size]
        bag_index = jnp.int32(config.queue_size + 1)
    else:
        queue = jnp.zeros((config.queue_size,), dtype=jnp.int32)
        draw = _draw(config)
        active, bag, bag_index, carry_key = draw(bag, bag_index, carry_key)
        for i in range(config.queue_size):
            p, bag, bag_index, carry_key = draw(bag, bag_index, carry_key)
            queue = queue.at[i].set(p)

    board = create_board(config.height, config.width, config.padding)
    sx = spawn_x_classic(config.padded_width, piece_box(pieces, active))
    hs = config.holder_size
    return EngineState(
        key=carry_key,
        board=board,
        piece=jnp.int32(active),
        rotation=jnp.int32(0),
        x=jnp.int32(sx),
        y=jnp.int32(0),
        bag=bag,
        bag_index=jnp.int32(bag_index),
        queue=queue,
        holder_piece=jnp.zeros((hs,), dtype=jnp.int32),
        holder_rotation=jnp.zeros((hs,), dtype=jnp.int32),
        holder_count=jnp.int32(0),
        has_swapped=jnp.bool_(False),
        game_over=jnp.bool_(False),
        score=jnp.float32(0),
        lines=jnp.int32(0),
        steps=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Observations
# ---------------------------------------------------------------------------


def active_mask(state: EngineState, config: EngineConfig, pieces: PieceSet = PIECES) -> jnp.ndarray:
    """Bounding-box mask of the active piece on the padded board.

    OOP parity: the mask covers the piece's (square) bounding box, not just
    its filled cells (ref: envs/tetris.py:571-576).
    """
    box = piece_box(pieces, state.piece)  # one-hot, not a vmapped gather
    rows = jnp.arange(config.padded_height)
    cols = jnp.arange(config.padded_width)
    rmask = (rows >= state.y) & (rows < state.y + box)
    cmask = (cols >= state.x) & (cols < state.x + box)
    return (rmask[:, None] & cmask[None, :]).astype(jnp.uint8)


def _strip(piece_ids, rotations, valid, pieces: PieceSet) -> jnp.ndarray:
    """Render a row of piece thumbnails ``[4, 4*n]``; invalid slots = bedrock.

    The (piece, rotation) matrix fetch is a one-hot contraction over the
    constant ``[n_pieces, 4, S, S]`` table — a vmapped per-slot gather
    serializes on TPU (same rule as :func:`ops.bitboard.piece_row_bits`).
    """
    size = pieces.matrices.shape[-1]
    table = jnp.asarray(pieces.matrices)  # [P, 4, S, S] binary
    n_p = table.shape[0]
    oh = (
        (piece_ids[:, None] == jnp.arange(n_p, dtype=jnp.int32)[None, :])[:, :, None]
        & (rotations[:, None] == jnp.arange(4, dtype=jnp.int32)[None, :])[:, None, :]
    ).astype(jnp.int32)  # [n, P, 4]
    mats = jnp.einsum("npr,prij->nij", oh, table.astype(jnp.int32))  # [n, S, S]
    ids_tab = jnp.asarray(pieces.ids, dtype=jnp.int32)
    ids = jnp.sum(
        jnp.where(piece_ids[:, None] == jnp.arange(n_p)[None, :], ids_tab[None, :], 0),
        axis=1,
    )[:, None, None]
    tiles = (mats * ids).astype(jnp.uint8)
    tiles = jnp.where(valid[:, None, None], tiles, jnp.uint8(1))
    return tiles.transpose(1, 0, 2).reshape(size, -1)


def project_active(state: EngineState, config: EngineConfig, pieces: PieceSet = PIECES) -> jnp.ndarray:
    """Board with the active piece stamped in (unless it overlaps: game over).

    OOP parity: envs/tetris.py:543-564 (projection is skipped when the piece
    collides at its current position — the game-over frame shows no piece).
    """
    mat = piece_matrix(pieces, state.piece, state.rotation)
    hit = collision(state.board, mat, state.x, state.y)
    stamped = project(state.board, mat, state.x, state.y, piece_id(pieces, state.piece))
    return jnp.where(hit, state.board, stamped)


def queue_holder_strips(state: EngineState, pieces: PieceSet = PIECES):
    """(queue_strip, holder_strip) thumbnail images for the Dict obs.

    ``[padding, padding*size]`` id images; empty holder slots render as
    bedrock-1s, as the reference renders an empty holder
    (ref: envs/tetris.py:566-615).  Shared by :func:`observe_dict` and the
    grouped env's per-candidate RGB mode (core/grouped.py) so the strip
    semantics cannot diverge.
    """
    slot = jnp.arange(state.queue.shape[0])
    queue_strip = _strip(state.queue, jnp.zeros_like(state.queue), slot >= 0, pieces)
    hslot = jnp.arange(state.holder_piece.shape[0])
    holder_strip = _strip(
        state.holder_piece, state.holder_rotation, hslot < state.holder_count, pieces
    )
    return queue_strip, holder_strip


def observe_dict(state: EngineState, config: EngineConfig, pieces: PieceSet = PIECES) -> dict:
    """OOP-style Dict observation (ref: envs/tetris.py:566-615).

    Keys/shapes match the reference observation space: ``board`` and
    ``active_tetromino_mask`` are padded-board images, ``holder``/``queue``
    are ``[padding, padding*size]`` thumbnail strips (empty holder slots
    render as bedrock-1s, as the reference renders an empty holder).
    """
    queue_strip, holder_strip = queue_holder_strips(state, pieces)
    return {
        "board": project_active(state, config, pieces).astype(jnp.uint8),
        "active_tetromino_mask": active_mask(state, config, pieces),
        "holder": holder_strip,
        "queue": queue_strip,
    }


def observe_board(state: EngineState, config: EngineConfig, pieces: PieceSet = PIECES) -> jnp.ndarray:
    """Compact cropped observation: binary stack with the active piece as -1
    (the compat engine's obs format, ref: tetris_fn.py:137-158)."""
    binary = jnp.where(state.board > 0, 1, 0).astype(jnp.int8)
    mat = piece_matrix(pieces, state.piece, state.rotation)
    stamped = project(binary, mat, state.x, state.y, jnp.int8(-1))
    out = jnp.where(state.game_over, binary, stamped)
    return out[: -config.padding, config.padding : -config.padding]


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------


def _commit(
    state: EngineState,
    rows: jnp.ndarray,
    hm: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet,
    rtab,
    rewards: RewardsMapping,
):
    """Drop-lock-clear-respawn; OOP commit semantics (ref: envs/tetris.py:450-479).

    ``rows`` is the bit-packed occupancy of ``state.board`` and ``hm`` the
    active piece's hit map at its current column (shared with the caller's
    gravity check).  Returns (new_state, reward): if the piece already
    overlaps (post-swap game over), nothing is placed and the game ends;
    otherwise the piece hard drops from its position, locks, filled rows
    clear with ``(lines**2)*width + alife`` reward, the next piece spawns and
    a spawn collision ends the game with the game_over reward.
    """
    kb = _kb(config)
    pieces = pieces.jx()
    pw = config.padded_width
    size = int(rtab.shape[-1])
    mat = piece_matrix(pieces, state.piece, state.rotation)
    rb = kb.piece_row_bits(rtab, state.piece, state.rotation)
    pre_over = kb.collision_at(hm, state.y, size)

    dist = kb.drop_from_map(hm, state.y, size)
    y_f = state.y + dist
    stamped = project(state.board, mat, state.x, y_f, piece_id(pieces, state.piece))
    stamped_rows = kb.project(rows, rb, state.x, y_f, pw)
    cleared_rows, lines, filled = kb.clear_lines(
        stamped_rows, config.height, config.width, config.padding
    )
    # re-pad with fresh bedrock exactly like ops.board.clear_lines (projection
    # may have added into the pad region; the clear resets it)
    pad = config.padding
    cleared = jnp.pad(
        kb.compact_ids(stamped[: config.height, pad:-pad], filled),
        ((0, pad), (pad, pad)),
        constant_values=jnp.int8(1),
    )

    new_piece, queue, bag, bag_index, key = _queue_draw(
        state.queue, state.bag, state.bag_index, state.key, config
    )
    sx = spawn_x_classic(config.padded_width, piece_box(pieces, new_piece))
    rb_new = kb.piece_row_bits(rtab, new_piece, jnp.int32(0))
    spawn_over = kb.collision(cleared_rows, rb_new, sx, jnp.int32(0), pw)

    line_reward = (lines * lines * config.width).astype(jnp.float32)
    reward = jnp.where(
        pre_over | spawn_over,
        jnp.float32(rewards.game_over),
        line_reward + jnp.float32(rewards.alife),
    )

    placed = state.replace(
        key=key,
        board=cleared,
        piece=jnp.int32(new_piece),
        rotation=jnp.int32(0),
        x=jnp.int32(sx),
        y=jnp.int32(0),
        bag=bag,
        bag_index=bag_index,
        queue=queue,
        has_swapped=jnp.bool_(False),
        game_over=spawn_over,
        lines=state.lines + lines,
    )
    new_state = select_tree(pre_over, state.replace(game_over=jnp.bool_(True)), placed)
    out_lines = jnp.where(pre_over, 0, lines)
    return new_state, reward, out_lines


def _swap(state: EngineState, config: EngineConfig, pieces: PieceSet):
    """Holder swap, orientation-preserving (ref: envs/tetris.py:242-252,
    components/tetromino_holder.py:31-48).

    If the holder is not yet full the active piece is stored and the next
    queue piece spawns; otherwise the active piece trades places with the
    oldest stored piece (which returns with its stored rotation).
    """
    pieces = pieces.jx()
    full = state.holder_count >= config.holder_size

    # store path: append at index holder_count, draw from queue
    idx = jnp.clip(state.holder_count, 0, config.holder_size - 1)
    hp_store = state.holder_piece.at[idx].set(state.piece)
    hr_store = state.holder_rotation.at[idx].set(state.rotation)
    q_piece, queue2, bag2, bidx2, key2 = _queue_draw(
        state.queue, state.bag, state.bag_index, state.key, config
    )

    # swap path: pop oldest, append current at the back
    out_piece = state.holder_piece[0]
    out_rot = state.holder_rotation[0]
    hp_swap = jnp.roll(state.holder_piece, -1).at[-1].set(state.piece)
    hr_swap = jnp.roll(state.holder_rotation, -1).at[-1].set(state.rotation)

    new_piece = jnp.where(full, out_piece, q_piece)
    new_rot = jnp.where(full, out_rot, 0)
    # reset position, centred on the incoming piece's box (rotation-invariant
    # since boxes are square; ref: envs/tetris.py:536-541)
    sx = spawn_x_classic(config.padded_width, piece_box(pieces, new_piece))

    return state.replace(
        key=jnp.where(full, state.key, key2),
        piece=jnp.int32(new_piece),
        rotation=jnp.int32(new_rot),
        x=jnp.int32(sx),
        y=jnp.int32(0),
        bag=jnp.where(full, state.bag, bag2),
        bag_index=jnp.where(full, state.bag_index, bidx2),
        queue=jnp.where(full, state.queue, queue2),
        holder_piece=jnp.where(full, hp_swap, hp_store),
        holder_rotation=jnp.where(full, hr_swap, hr_store),
        holder_count=jnp.minimum(state.holder_count + 1, config.holder_size),
        has_swapped=jnp.bool_(True),
    )


def _apply_action(state: EngineState, rows, action, config: EngineConfig, pieces: PieceSet, rtab):
    """Phase 1 of a step: the action's direct effect (before gravity/commit).

    All collision probes run on the bit-packed ``rows`` (shift+AND hit maps,
    :mod:`ops.bitboard`); the board itself is untouched in this phase.
    """
    kb = _kb(config)
    pw = config.padded_width
    size = int(rtab.shape[-1])
    rb = kb.piece_row_bits(rtab, state.piece, state.rotation)

    # translations
    dx = jnp.where(action == ACTIONS.move_left, -1, jnp.where(action == ACTIONS.move_right, 1, 0))
    x_cand = state.x + dx
    hm_cand = kb.hit_map(rows, kb.shift_piece(rb, x_cand, pw))
    x = jnp.where((dx != 0) & ~kb.collision_at(hm_cand, state.y, size), x_cand, state.x)
    hm_x = kb.hit_map(rows, kb.shift_piece(rb, x, pw))
    down = (action == ACTIONS.move_down) & ~kb.collision_at(hm_x, state.y + 1, size)
    y = state.y + down.astype(jnp.int32)

    # rotations (checked at the updated position)
    rot_dir = jnp.where(
        action == ACTIONS.rotate_clockwise,
        1,
        jnp.where(action == ACTIONS.rotate_counterclockwise, -1, 0),
    )
    rot_cand = jnp.mod(state.rotation + rot_dir, 4)
    rb_cand = kb.piece_row_bits(rtab, state.piece, rot_cand)
    rot_ok = ~kb.collision(rows, rb_cand, x, y, pw)
    rotation = jnp.where((rot_dir != 0) & rot_ok, rot_cand, state.rotation)

    moved = state.replace(x=x, y=y, rotation=rotation)

    # swap (mutually exclusive with the moves above)
    do_swap = (action == ACTIONS.swap) & ~state.has_swapped
    swapped = _swap(state, config, pieces)
    return select_tree(do_swap, swapped, moved)


def step(
    state: EngineState,
    action: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    rewards: RewardsMapping = REWARDS,
    obs_fn: Optional[Callable] = None,
) -> Tuple[EngineState, dict, jnp.ndarray, jnp.ndarray, dict]:
    """One step of the flagship engine.

    Follows the OOP control flow (ref: envs/tetris.py:203-272): action effect,
    then a gravity sub-step for non-hard-drop actions which commits the piece
    when it cannot fall.  Returns ``(state, obs, reward, done, info)``.

    With ``config.auto_reset`` the returned state of a finished episode is a
    fresh one (new PRNG stream split from the old); ``done`` still reports the
    termination so trajectory buffers see the episode boundary.
    """
    kb = _kb(config)
    obs_fn = obs_fn or observe_dict
    rtab = kb.row_bits_table(pieces)
    rows = kb.pack_board(state.board)
    s1 = _apply_action(state, rows, action, config, pieces, rtab)

    is_drop = action == ACTIONS.hard_drop
    rb1 = kb.piece_row_bits(rtab, s1.piece, s1.rotation)
    hm1 = kb.hit_map(rows, kb.shift_piece(rb1, s1.x, config.padded_width))
    grav_free = ~kb.collision_at(hm1, s1.y + 1, int(rtab.shape[-1]))

    if config.gravity_enabled:
        fall = ~is_drop & grav_free
        commit_now = is_drop | ~grav_free
    else:
        fall = jnp.bool_(False)
        commit_now = is_drop

    s1 = s1.replace(y=s1.y + fall.astype(jnp.int32))
    committed, commit_reward, lines = _commit(s1, rows, hm1, config, pieces, rtab, rewards)

    stepped = select_tree(commit_now, committed, s1)
    reward = jnp.where(commit_now, commit_reward, jnp.float32(0))
    lines = jnp.where(commit_now, lines, 0)
    stepped = stepped.replace(score=stepped.score + reward, steps=stepped.steps + 1)

    # finished games freeze (no auto_reset) — parity with the compat engine
    frozen = state
    stepped = select_tree(state.game_over, frozen, stepped)
    reward = jnp.where(state.game_over, jnp.float32(0), reward)
    lines = jnp.where(state.game_over, 0, lines)

    done = stepped.game_over
    if config.auto_reset:
        # the counter RNG just keeps streaming: init_state's draws advance it
        fresh = init_state(stepped.key, config, pieces)
        stepped = select_tree(done, fresh, stepped)

    obs = obs_fn(stepped, config, pieces)
    info = {"lines_cleared": lines, "score": stepped.score, "steps": stepped.steps}
    return stepped, obs, reward, done, info


def reset(
    key: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    obs_fn: Optional[Callable] = None,
) -> Tuple[EngineState, dict]:
    """Fresh episode: -> (state, obs)."""
    obs_fn = obs_fn or observe_dict
    state = init_state(key, config, pieces)
    return state, obs_fn(state, config, pieces)


# ---------------------------------------------------------------------------
# Batched entry points (cached jits, one compile per config)
# ---------------------------------------------------------------------------


def render_rgb(state: EngineState, config: EngineConfig, pieces: PieceSet = PIECES) -> jnp.ndarray:
    """RGB frame with the reference's composite layout: board left, queue
    top-right, holder bottom-right (ref: wrappers/observation.py:38-74)."""
    from tetris_gymnasium_tpu.ops.observations import compose_rgb

    obs = observe_dict(state, config, pieces)
    return compose_rgb(obs["board"], obs["queue"], obs["holder"], pieces)


@functools.lru_cache(maxsize=None)
def jit_render_rgb(config: EngineConfig):
    """Cached jitted RGB renderer for the default piece set."""
    return jax.jit(functools.partial(render_rgb, config=config))


@functools.lru_cache(maxsize=None)
def jit_observe(config: EngineConfig, obs: str = "dict"):
    """Cached jitted observation fn for the default piece set."""
    obs_fn = {"dict": observe_dict, "board": observe_board}[obs]
    return jax.jit(functools.partial(obs_fn, config=config))


@functools.lru_cache(maxsize=None)
def jit_step(config: EngineConfig, obs: str = "dict", rewards: RewardsMapping = REWARDS):
    """Cached single-env jitted step for the default piece set."""
    obs_fn = {"dict": observe_dict, "board": observe_board}[obs]
    return jax.jit(
        functools.partial(step, config=config, obs_fn=obs_fn, rewards=rewards)
    )


@functools.lru_cache(maxsize=None)
def jit_reset(config: EngineConfig, obs: str = "dict"):
    """Cached single-env jitted reset for the default piece set."""
    obs_fn = {"dict": observe_dict, "board": observe_board}[obs]
    return jax.jit(functools.partial(reset, config=config, obs_fn=obs_fn))


@functools.lru_cache(maxsize=None)
def _batched(config: EngineConfig, obs_kind: str):
    obs_fn = {"dict": observe_dict, "board": observe_board}[obs_kind]
    step_b = jax.jit(
        jax.vmap(functools.partial(step, config=config, obs_fn=obs_fn))
    )
    reset_b = jax.jit(jax.vmap(functools.partial(reset, config=config, obs_fn=obs_fn)))
    return step_b, reset_b


def batched_step(states, actions, *, config: EngineConfig, obs: str = "dict"):
    """vmap+jit step over the leading env axis."""
    return _batched(config, obs)[0](states, actions)


def batched_reset(keys, *, config: EngineConfig, obs: str = "dict"):
    """vmap+jit reset over a batch of PRNG keys ``[B, 2]``."""
    return _batched(config, obs)[1](keys)


def rollout(
    state: EngineState,
    actions: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    obs_fn: Optional[Callable] = None,
):
    """Scan an action sequence ``[T]`` or ``[T, B]`` in one XLA program."""
    batched = state.board.ndim == 3

    def one(carry, action):
        if batched:
            s, o, r, d, info = jax.vmap(
                lambda cs, ca: step(cs, ca, config, pieces, obs_fn=obs_fn or observe_board)
            )(carry, action)
        else:
            s, o, r, d, info = step(carry, action, config, pieces, obs_fn=obs_fn or observe_board)
        return s, (o, r, d, info["lines_cleared"])

    return jax.lax.scan(one, state, actions)
