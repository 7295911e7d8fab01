"""Grouped placement engine: the (column, rotation) action MDP.

Functional re-design of the reference ``GroupedActionsObservations`` wrapper
(ref: tetris_gymnasium/wrappers/grouped.py).  The reference enumerates all
``width * 4`` placements with a Python double loop of drop simulations per
step (ref: grouped.py:148-181); here the candidate axis is a vmapped array
axis, so all placements of all envs evaluate as one fused device program —
and it composes with the env batch axis (``vmap ∘ vmap``).

Statefulness: the reference caches the legality mask on the wrapper object
between ``observation()`` and ``step()`` (ref: grouped.py:74, 139); here the
mask is explicit state carried in :class:`GroupedState`.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig, RewardsMapping
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.core.engine import EngineState
from tetris_gymnasium_tpu.ops.board import clear_lines, collision, drop_distance, project
from tetris_gymnasium_tpu.ops.observations import (
    FeatureFlags,
    compose_rgb,
    feature_vector,
)
from tetris_gymnasium_tpu.pieces import PIECES, PieceSet, piece_matrix
from tetris_gymnasium_tpu.utils.tree import select_tree

ACTIONS = ActionsMapping()
REWARDS = RewardsMapping()


@struct.dataclass
class GroupedState:
    """Engine state + the legality mask of the *current* piece's placements."""

    env: EngineState
    mask: jnp.ndarray  # float32 [width*4], 1 = legal


def encode_action(x: int, r: int) -> int:
    """(column, rotation) -> action id (ref: grouped.py:78-88)."""
    return x * 4 + r


def decode_action(action):
    """action id -> (column, rotation) (ref: grouped.py:90-99)."""
    return action // 4, action % 4


def _frame_overlap(board, piece, x, y):
    """True iff a filled piece cell overlaps a bedrock cell (id 1).

    The legality test: only frame collisions make a placement illegal; stack
    collisions that end the game are legal (ref: grouped.py:101-122).
    """
    h, w = piece.shape
    section = jax.lax.dynamic_slice(board, (y, x), (h, w))
    return jnp.any((section == 1) & (piece > 0))


def _candidate(board, piece, rotation, cand, config: EngineConfig, pieces: PieceSet):
    """Evaluate one placement candidate: drop from the top, lock, clear.

    Returns (board_after [H+p, W+2p] int8, legal bool, game_over bool, lines).
    Sentinel boards follow the reference: illegal -> all ones, game-over
    placement -> all zeros (ref: grouped.py:164-177).
    """
    from tetris_gymnasium_tpu.core.engine import piece_box, piece_id

    pieces = pieces.jx()
    x_base, r = cand // 4, cand % 4
    rot = jnp.mod(rotation + r, 4)
    mat = piece_matrix(pieces, piece, rot)
    # one-hot box/id lookups: vmapped per-candidate scalar gathers serialise
    x = x_base + config.padding - piece_box(pieces, piece) // 2
    y = drop_distance(board, mat, x, jnp.int32(0))  # drop from the top

    frame_hit = _frame_overlap(board, mat, x, y)
    stack_hit = collision(board, mat, x, y)
    placed = project(board, mat, x, y, piece_id(pieces, piece))
    cleared, lines = clear_lines(placed, config.height, config.width, config.padding)

    obs = jnp.where(
        frame_hit,
        jnp.ones_like(board),
        jnp.where(stack_hit, jnp.zeros_like(board), cleared),
    )
    return obs, ~frame_hit, stack_hit & ~frame_hit, jnp.where(frame_hit | stack_hit, 0, lines)


def placements(
    state: EngineState, config: EngineConfig, pieces: PieceSet = PIECES
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All ``width*4`` placement boards + legality mask for the active piece.

    Returns (boards ``[A, H+p, W+2p]`` int8, mask ``[A]`` float32,
    game_over ``[A]`` bool, lines ``[A]`` int32).
    """
    cands = jnp.arange(config.width * 4, dtype=jnp.int32)
    boards, legal, over, lines = jax.vmap(
        lambda c: _candidate(state.board, state.piece, state.rotation, c, config, pieces)
    )(cands)
    return boards, legal.astype(jnp.float32), over, lines


def grouped_observation(
    state: EngineState,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    mode: str = "boards",
    feature_flags: FeatureFlags = FeatureFlags(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(observation, mask) for the current state.

    ``mode='boards'``: per-candidate padded boards (float32, reference obs
    space dtype, ref: grouped.py:67-72).  ``mode='features'``: per-candidate
    feature vectors of the post-placement playfield — features are computed
    on the sentinel boards too, as the reference applies its observation
    wrappers after sentinel substitution (ref: grouped.py:183-206), but
    without reproducing the reference's row-zeroing fancy-index bug
    (ref: wrappers/observation.py:252).  ``mode='rgb'``: per-candidate RGB
    composites — the reference's ``observation_wrappers=[RgbObservation]``
    path, which rebuilds each candidate as a Dict obs (candidate board, zero
    active mask, live queue/holder strips) and renders it
    (ref: grouped.py:183-206); here the 40 candidates render as one batched
    one-hot palette contraction.
    """
    boards, mask, over, _ = placements(state, config, pieces)
    if mode == "boards":
        return boards.astype(jnp.float32), mask
    if mode == "features":
        crop = boards[:, : -config.padding, config.padding : -config.padding]
        feats = jax.vmap(lambda b: feature_vector(b, feature_flags))(crop)
        return feats.astype(jnp.float32), mask
    if mode == "rgb":
        queue_strip, holder_strip = engine.queue_holder_strips(state, pieces)
        rgb = jax.vmap(
            lambda b: compose_rgb(
                b.astype(jnp.uint8), queue_strip, holder_strip, pieces
            )
        )(boards)
        return rgb, mask
    raise ValueError(f"unknown grouped observation mode: {mode}")


def reset(
    key: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    mode: str = "boards",
) -> Tuple[GroupedState, jnp.ndarray]:
    """Fresh grouped episode: -> (state, observation)."""
    env_state = engine.init_state(key, config, pieces)
    obs, mask = grouped_observation(env_state, config, pieces, mode)
    return GroupedState(env=env_state, mask=mask), obs


def step(
    gstate: GroupedState,
    action: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    rewards: RewardsMapping = REWARDS,
    mode: str = "boards",
    terminate_on_illegal: bool = True,
) -> Tuple[GroupedState, jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """One placement action: teleport, hard drop, re-derive the mask.

    Ref parity: grouped.py:209-269 — an illegal action either terminates with
    the ``invalid_action`` reward and a ``high``-valued sentinel observation,
    or (``terminate_on_illegal=False``) no-ops with the penalty.
    """
    env_state = gstate.env
    x_base, r = decode_action(action)
    illegal = gstate.mask[action] == 0

    # teleport (no collision checks — ref: grouped.py:241-254) and hard drop
    rot = jnp.mod(env_state.rotation + r, 4)
    x = x_base + config.padding - jnp.asarray(pieces.box)[env_state.piece] // 2
    teleported = env_state.replace(x=jnp.int32(x), rotation=jnp.int32(rot))
    dropped, _, drop_reward, drop_done, drop_info = engine.step(
        teleported, jnp.int32(ACTIONS.hard_drop), config, pieces, rewards,
        obs_fn=lambda s, c, p: (),
    )

    if terminate_on_illegal:
        ill_state, ill_done = env_state, jnp.bool_(True)
        ill_lines = jnp.int32(0)
    else:
        ill_state, _, _, ill_done, ill_info = engine.step(
            env_state, jnp.int32(ACTIONS.no_op), config, pieces, rewards,
            obs_fn=lambda s, c, p: (),
        )
        ill_lines = ill_info["lines_cleared"]

    new_env = select_tree(illegal, ill_state, dropped)
    done = jnp.where(illegal, ill_done, drop_done)
    reward = jnp.where(illegal, jnp.float32(rewards.invalid_action), drop_reward)
    lines = jnp.where(illegal, ill_lines, drop_info["lines_cleared"])

    # Under auto_reset the inner engine already restarts drop-terminated games;
    # the illegal-action termination path (which bypasses the engine step) must
    # restart here too so a training loop never steps a dead env.  Same key
    # discipline as the engine's own auto-reset (engine.step): the counter
    # RNG just keeps streaming — one RNG family end to end (round-2 review
    # weak #5; previously this path detoured through a threefry split).
    if config.auto_reset and terminate_on_illegal:
        fresh = engine.init_state(new_env.key, config, pieces)
        new_env = select_tree(illegal, fresh, new_env)

    obs, mask = grouped_observation(new_env, config, pieces, mode)
    if terminate_on_illegal:
        # Sentinel = the observation space's `high` (ref: grouped.py:221-224).
        # For id/feature modes that is height*width; the rgb space is honestly
        # declared 0..255 (the reference declares high=h*w even for RGB inner
        # wrappers — a space bug we fix, like FeatureVectorObservation's).
        high = jnp.float32(255 if mode == "rgb" else config.height * config.width)
        obs = jnp.where(illegal, jnp.full_like(obs, high), obs)

    new_gstate = GroupedState(env=new_env, mask=mask)
    info = {"lines_cleared": lines, "action_mask": mask, "score": new_env.score}
    return new_gstate, obs, reward, done, info


@functools.lru_cache(maxsize=None)
def _batched(config: EngineConfig, mode: str, terminate_on_illegal: bool):
    step_b = jax.jit(
        jax.vmap(
            functools.partial(
                step, config=config, mode=mode, terminate_on_illegal=terminate_on_illegal
            )
        )
    )
    reset_b = jax.jit(jax.vmap(functools.partial(reset, config=config, mode=mode)))
    return step_b, reset_b


def batched_step(gstates, actions, *, config, mode="boards", terminate_on_illegal=True):
    """vmap+jit grouped step over the leading env axis."""
    return _batched(config, mode, terminate_on_illegal)[0](gstates, actions)


def batched_reset(keys, *, config, mode="boards", terminate_on_illegal=True):
    """vmap+jit grouped reset over a batch of PRNG keys."""
    return _batched(config, mode, terminate_on_illegal)[1](keys)


@functools.lru_cache(maxsize=None)
def jit_step(config: EngineConfig, mode: str = "boards", terminate_on_illegal: bool = True):
    """Cached single-env jitted grouped step."""
    return jax.jit(
        functools.partial(
            step, config=config, mode=mode, terminate_on_illegal=terminate_on_illegal
        )
    )


@functools.lru_cache(maxsize=None)
def jit_observation(config: EngineConfig, mode: str = "boards"):
    """Cached single-env jitted grouped observation."""
    return jax.jit(functools.partial(grouped_observation, config=config, mode=mode))
