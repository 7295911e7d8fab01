"""Turbo grouped engine: batch-minor placement MDP over bit-packed boards.

Same placement semantics as :mod:`tetris_gymnasium_tpu.core.grouped` — all
``width * 4`` (column, rotation) candidates of the active piece evaluated
per step, reference sentinel observations and legality rules
(ref: tetris_gymnasium/wrappers/grouped.py:101-207) — rebuilt on the turbo
engine's layout: the candidate axis ``A`` and the env batch ``B`` are
trailing batch dims of every kernel, so one step evaluates ``[H, A, B]``
candidate boards as full-lane VPU vector ops instead of the flagship's
``vmap ∘ vmap`` of per-candidate id-board programs.

Trajectory equivalence with the flagship grouped engine is pinned
field-for-field in ``tests/test_turbo_grouped.py`` (same masks, same
feature observations, same rewards/terminations/lines from the same keys),
which transitively inherits the golden-CSV and literal-mask parity of the
flagship grouped suite.

Observation modes: ``mode="features"`` (the layout every grouped training
workload consumes, ref: examples/train_lin_grouped.py) and ``mode="boards"``
— per-candidate BINARY playfield images ``[B, A, H, W]`` unpacked straight
from the packed candidate rows (the reference grouped env's default obs,
ref: tetris_gymnasium/wrappers/grouped.py:67-72, 124-207, with the same
all-ones / all-zeros / ``high`` sentinels).  The packed occupancy rows carry
no per-cell piece ids, so boards are binary here; the flagship grouped
engine remains the path for id-palette boards.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig, RewardsMapping
from tetris_gymnasium_tpu.core import turbo
from tetris_gymnasium_tpu.core.turbo import TurboState
from tetris_gymnasium_tpu.ops import bitboard as bb
from tetris_gymnasium_tpu.ops import bitboard_wide as bw
from tetris_gymnasium_tpu.pieces import PIECES, PieceSet
from tetris_gymnasium_tpu.utils.tree import select_tree

ACTIONS = ActionsMapping()
REWARDS = RewardsMapping()


@struct.dataclass
class TurboGroupedState:
    """Turbo engine state + the current piece's legality mask ``[A, B]``."""

    env: TurboState
    mask: jnp.ndarray  # float32 [A, B], 1 = legal


def _bed_rows(config: EngineConfig) -> np.ndarray:
    """Static bedrock-only rows (an empty board IS the frame):
    ``uint32[H]`` single-word, ``uint32[H, NW]`` for wide boards."""
    if config.padded_width <= 32:
        return bb.empty_rows(config.height, config.width, config.padding)
    return bw.empty_rows(config.height, config.width, config.padding)


def _features_from_rows(rows: jnp.ndarray, config: EngineConfig) -> jnp.ndarray:
    """Feature vector ``float32[F, *batch]`` from packed rows ``[H, *batch]``.

    Value parity with ``ops.observations.feature_vector`` on the cropped
    playfield: [per-column heights (W), max height, holes, bumpiness]
    (ref: wrappers/observation.py:177-236).
    """
    H, pad, W = config.height, config.padding, config.width
    inner = rows[:H]
    h = turbo._h_iota(H, inner.ndim - (0 if config.padded_width <= 32 else 1))
    heights = []
    hole_counts = []
    for w in range(pad, pad + W):
        col = turbo._col_bits(inner, w, config)  # [H, *batch]
        top = jnp.min(jnp.where(col, h, jnp.int32(H)), axis=0)
        height_w = jnp.int32(H) - top
        count_w = jnp.sum(col.astype(jnp.int32), axis=0)
        heights.append(height_w)
        hole_counts.append(height_w - count_w)  # empty cells under the top
    hs = jnp.stack(heights)  # [W, *batch]
    max_h = jnp.max(hs, axis=0)
    holes = sum(hole_counts)
    bump = jnp.sum(jnp.abs(hs[1:] - hs[:-1]), axis=0)
    return jnp.concatenate(
        [hs, max_h[None], holes[None], bump[None]], axis=0
    ).astype(jnp.float32)  # [W+3, *batch]


def _candidate_geometry(t, config: EngineConfig, piece, rotation):
    """Per-candidate (rot, x) ``int32[A, B]`` for piece/rotation ``[B]``."""
    n_actions = config.width * 4
    cand = jnp.arange(n_actions, dtype=jnp.int32)[:, None]  # [A, 1]
    r = jnp.mod(rotation[None, :] + cand % 4, 4)  # [A, B]
    box = turbo._lookup_i32(t.box, piece)  # [B]
    x = cand // 4 + jnp.int32(config.padding) - box[None, :] // 2  # [A, B]
    return r, x


def _candidate_rows(
    state: TurboState, config: EngineConfig, pieces: PieceSet, max_clear: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop/lock/clear every candidate: -> (cleared rows ``uint32[H, A, B]``,
    frame_hit ``bool[A, B]``, stack_hit ``bool[A, B]``, lines ``int32[A, B]``).

    Flagship-candidate semantics (core/grouped.py:_candidate): drop from the
    top, legality = no bedrock overlap at rest, game-over = stack overlap at
    rest (ref: grouped.py:101-122, 148-181).
    """
    t = turbo._tables_for(pieces)
    S = t.size
    H = config.padded_height
    pw = config.padded_width
    B = state.rows.shape[-1]  # env axis is minor (wide rows carry [H, NW, B])
    A = config.width * 4

    rot, x = _candidate_geometry(t, config, state.piece, state.rotation)
    piece_ab = jnp.broadcast_to(state.piece[None, :], (A, B))
    rb = turbo._row_bits(t, piece_ab, rot)  # [S, A, B]
    sp = turbo._shift(rb, x, pw)  # [S, A, B] (wide: [S, NW, A, B])

    if pw <= 32:
        rows_ab = jnp.broadcast_to(state.rows[:, None, :], (H, A, B))
        bed = jnp.broadcast_to(jnp.asarray(_bed_rows(config))[:, None, None], (H, A, B))
    else:
        nw = state.rows.shape[1]
        rows_ab = jnp.broadcast_to(state.rows[:, :, None, :], (H, nw, A, B))
        bed = jnp.broadcast_to(
            jnp.asarray(_bed_rows(config))[:, :, None, None], (H, nw, A, B)
        )
    hm = turbo._hit_map_r(rows_ab, sp, pw)  # stack+frame hits [H, A, B]
    y = turbo._drop_from_map(hm, jnp.zeros_like(x), S)  # resting y from top

    hm_bed = turbo._hit_map_r(bed, sp, pw)
    frame_hit = turbo._collision_at(hm_bed, y, S)  # [A, B]
    rest_hit = turbo._collision_at(hm, y, S)
    stack_hit = rest_hit & ~frame_hit

    stamped = turbo._project(rows_ab, sp, y, S)
    cleared, lines = turbo._clear_lines(stamped, config, max_clear=max_clear)
    # Always-on envelope safety (see turbo._envelope_debug): a surgically
    # built board with > max_clear simultaneously-full rows makes the
    # candidate a game-over placement instead of a mis-compacted board.
    stack_hit = stack_hit | (lines > max_clear)
    lines = jnp.where(frame_hit | stack_hit, 0, lines)
    return cleared, frame_hit, stack_hit, lines


def placements(
    state: TurboState, config: EngineConfig, pieces: PieceSet = PIECES, max_clear: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate all candidates: -> (features [F, A, B], mask [A, B],
    game_over [A, B], lines [A, B]).

    Sentinel features are those of the all-ones / all-zeros boards
    (ref: grouped.py:164-177 applied through the feature wrapper).
    """
    cleared, frame_hit, stack_hit, lines = _candidate_rows(
        state, config, pieces, max_clear=max_clear
    )

    feats = _features_from_rows(cleared, config)  # [F, A, B]
    W = config.width
    ones_feats = jnp.asarray(
        [config.height] * (W + 1) + [0, 0], dtype=jnp.float32
    ).reshape(W + 3, 1, 1)
    feats = jnp.where(frame_hit[None], ones_feats, feats)
    feats = jnp.where(stack_hit[None], jnp.float32(0), feats)

    mask = (~frame_hit).astype(jnp.float32)
    return feats, mask, stack_hit, lines


def placement_boards(
    state: TurboState, config: EngineConfig, pieces: PieceSet = PIECES, max_clear: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Evaluate all candidates as BINARY playfield boards.

    -> (boards ``float32[B, A, H, W]``, mask [A, B], game_over [A, B],
    lines [A, B]).  Boards are the post-lock post-clear playfield occupancy
    unpacked from the packed candidate rows; sentinels follow the reference
    (illegal -> all ones, game-over placement -> all zeros,
    ref: grouped.py:164-177).  Binary because packed rows carry no piece ids
    — the flagship grouped engine serves id-palette boards.

    Layout: the PACKED uint32 words are transposed first
    ([H, A, B] -> [B, A, H], 32x less data than a per-pixel transpose) and
    then broadcast-unpacked along a fresh W axis — the same trick the
    profiling of round 3 put into ``turbo.observe_board``
    (docs/scale/training_perf.md).
    """
    cleared, frame_hit, stack_hit, lines = _candidate_rows(
        state, config, pieces, max_clear=max_clear
    )

    boards = turbo.unpack_playfield(cleared, config, jnp.float32)  # [B, A, H, W]
    fh = jnp.transpose(frame_hit)[:, :, None, None]  # [B, A, 1, 1]
    sh = jnp.transpose(stack_hit)[:, :, None, None]
    boards = jnp.where(fh, jnp.float32(1), boards)
    boards = jnp.where(sh, jnp.float32(0), boards)

    mask = (~frame_hit).astype(jnp.float32)
    return boards, mask, stack_hit, lines


def observation(
    state: TurboState,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    mode: str = "features",
    max_clear: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(observation, mask ``float32[A, B]``) for the current state.

    ``mode='features'``: ``float32[B, A, F]`` per-candidate feature vectors.
    ``mode='boards'``: ``float32[B, A, H, W]`` per-candidate binary boards.
    The observation moves the batch axis to the front at the NN boundary
    (like ``turbo.observe_board``); the mask stays batch-minor for the
    engine's internal use — callers wanting ``[B, A]`` transpose it.
    """
    if mode == "features":
        feats, mask, _, _ = placements(state, config, pieces, max_clear=max_clear)
        return jnp.transpose(feats, (2, 1, 0)), mask
    if mode == "boards":
        boards, mask, _, _ = placement_boards(state, config, pieces, max_clear=max_clear)
        return boards, mask  # already [B, A, H, W]
    raise ValueError(f"unknown turbo grouped observation mode: {mode}")


def reset(
    keys: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    mode: str = "features",
    max_clear: int = 4,
) -> Tuple[TurboGroupedState, jnp.ndarray]:
    """Fresh grouped batch from per-env keys ``[B, 2]``: -> (state, obs)."""
    env = turbo.init(keys, config, pieces)
    obs, mask = observation(env, config, pieces, mode, max_clear=max_clear)
    return TurboGroupedState(env=env, mask=mask), obs


def step(
    gstate: TurboGroupedState,
    action: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    rewards: RewardsMapping = REWARDS,
    mode: str = "features",
    terminate_on_illegal: bool = True,
    max_clear: int = 4,
) -> Tuple[TurboGroupedState, jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """One placement action per env, ``action`` is ``int32[B]``.

    Mirrors the flagship grouped step exactly (core/grouped.py:step, ref:
    grouped.py:209-269): teleport (no collision check), hard drop through
    the engine, illegal actions terminate with the ``invalid_action`` reward
    and an all-``high`` sentinel observation (or no-op with the penalty),
    auto-reset restarts drop- and illegal-terminated games on device.
    """
    t = turbo._tables_for(pieces)
    env = gstate.env
    A = config.width * 4

    onehot = jnp.arange(A, dtype=jnp.int32)[:, None] == action[None, :]  # [A, B]
    illegal = jnp.sum(jnp.where(onehot, gstate.mask, 0.0), axis=0) == 0  # [B]

    # teleport + hard drop (ref: grouped.py:241-257)
    x_base, r = action // 4, jnp.mod(action, 4)
    rot = jnp.mod(env.rotation + r, 4)
    box = turbo._lookup_i32(t.box, env.piece)
    x = x_base + jnp.int32(config.padding) - box // 2
    teleported = env.replace(x=x, rotation=rot)
    drop_a = jnp.full_like(action, ACTIONS.hard_drop)
    dropped, _, drop_reward, drop_done, drop_info = turbo.step(
        teleported, drop_a, config, pieces, rewards, max_clear=max_clear
    )

    if terminate_on_illegal:
        ill_env, ill_done = env, jnp.ones_like(illegal)
        ill_lines = jnp.zeros_like(env.lines)
        # flagship parity: illegal-terminated envs restart under auto_reset by
        # continuing the counter-RNG stream, exactly like the engine's own
        # auto-reset path (turbo.step / core/grouped.py step).
        if config.auto_reset:
            fresh = turbo._init_from_key(env.key, config, pieces)
            ill_env = select_tree(illegal, fresh, ill_env)
    else:
        noop_a = jnp.full_like(action, ACTIONS.no_op)
        ill_env, _, _, ill_done, ill_info = turbo.step(
            env, noop_a, config, pieces, rewards, max_clear=max_clear
        )
        ill_lines = ill_info["lines_cleared"]

    new_env = select_tree(illegal, ill_env, dropped)
    done = jnp.where(illegal, ill_done, drop_done)
    reward = jnp.where(illegal, jnp.float32(rewards.invalid_action), drop_reward)
    lines = jnp.where(illegal, ill_lines, drop_info["lines_cleared"])

    obs, mask = observation(new_env, config, pieces, mode, max_clear=max_clear)
    if terminate_on_illegal:
        high = jnp.float32(config.height * config.width)
        ill_b = illegal.reshape((-1,) + (1,) * (obs.ndim - 1))  # [B, 1, ...]
        obs = jnp.where(ill_b, high, obs)

    new_gstate = TurboGroupedState(env=new_env, mask=mask)
    info = {"lines_cleared": lines, "action_mask": mask, "score": new_env.score}
    return new_gstate, obs, reward, done, info


@functools.lru_cache(maxsize=None)
def jit_step(
    config: EngineConfig,
    terminate_on_illegal: bool = True,
    mode: str = "features",
    max_clear: int = 4,
):
    """Cached jitted batched grouped step for the default piece set."""
    return jax.jit(
        functools.partial(
            step,
            config=config,
            mode=mode,
            terminate_on_illegal=terminate_on_illegal,
            max_clear=max_clear,
        )
    )


@functools.lru_cache(maxsize=None)
def jit_reset(config: EngineConfig, mode: str = "features", max_clear: int = 4):
    """Cached jitted batched grouped reset for the default piece set."""
    return jax.jit(
        functools.partial(reset, config=config, mode=mode, max_clear=max_clear)
    )
