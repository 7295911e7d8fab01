"""Behavioural tests of the flagship engine (holder/swap, queue, scoring)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.pieces import PIECES

A = ActionsMapping()
CFG = EngineConfig()


def _state(seed=0, config=CFG):
    return engine.jit_reset(config)(jax.random.PRNGKey(seed))[0]


def _jit_step(config=CFG):
    return engine.jit_step(config)


def test_init_state_spawn_and_queue():
    s = _state(0)
    # bag is a permutation of 0..6
    assert sorted(np.asarray(s.bag).tolist()) == list(range(7))
    # preview queue holds the next 4 bag entries after the active piece
    bag = np.asarray(s.bag).tolist()
    assert int(s.piece) == bag[0]
    assert np.asarray(s.queue).tolist() == bag[1:5]
    # spawn column centred on the piece's box
    box = int(PIECES.box[int(s.piece)])
    assert int(s.x) == CFG.padded_width // 2 - box // 2
    assert int(s.y) == 0
    assert not bool(s.game_over)


def test_bag_sequence_is_7_bag():
    """Across any window of 7 consecutive spawned pieces from one bag, each
    piece appears exactly once (ref property: tetromino_randomizer bag tests)."""
    cfg = EngineConfig(gravity_enabled=False)
    s = _state(3, cfg)
    step = _jit_step(cfg)
    seen = [int(s.piece)]
    for _ in range(6):
        s, *_ = step(s, jnp.int32(A.hard_drop))
        seen.append(int(s.piece))
    assert sorted(seen) == list(range(7))


def test_moves_and_rotation():
    cfg = EngineConfig(gravity_enabled=False)
    s = _state(1, cfg)
    step = _jit_step(cfg)
    x0 = int(s.x)
    s, *_ = step(s, jnp.int32(A.move_left))
    assert int(s.x) == x0 - 1
    s, *_ = step(s, jnp.int32(A.move_right))
    assert int(s.x) == x0
    s, *_ = step(s, jnp.int32(A.move_down))
    assert int(s.y) == 1
    r0 = int(s.rotation)
    s, *_ = step(s, jnp.int32(A.rotate_clockwise))
    assert int(s.rotation) == (r0 + 1) % 4
    s, *_ = step(s, jnp.int32(A.rotate_counterclockwise))
    assert int(s.rotation) == r0


def test_gravity_pulls_and_commits():
    s = _state(2)  # gravity on
    step = _jit_step(CFG)
    piece0 = int(s.piece)
    # no_op steps: piece falls one row per step
    for t in range(3):
        s, _, r, d, _ = step(s, jnp.int32(A.no_op))
        assert int(s.y) == t + 1
        assert float(r) == 0.0
    # eventually the piece locks and a new one spawns with alife reward
    total_alife = 0.0
    for _ in range(30):
        s, _, r, d, info = step(s, jnp.int32(A.no_op))
        total_alife += float(r)
        if int(s.steps) > 0 and int(s.y) == 0:
            break
    assert float(total_alife) == 1.0  # one commit -> alife reward
    assert int(s.board.sum()) > int(_state(2).board.sum())


def test_swap_semantics():
    cfg = EngineConfig(gravity_enabled=False)
    s = _state(5, cfg)
    step = _jit_step(cfg)
    p0, q0 = int(s.piece), int(s.queue[0])
    # first swap: holder empty -> store, spawn queue head
    s, *_ = step(s, jnp.int32(A.swap))
    assert int(s.holder_count) == 1
    assert int(s.holder_piece[0]) == p0
    assert int(s.piece) == q0
    assert bool(s.has_swapped)
    # second swap in the same piece: blocked
    p1 = int(s.piece)
    s, *_ = step(s, jnp.int32(A.swap))
    assert int(s.piece) == p1
    assert int(s.holder_piece[0]) == p0
    # lock a piece -> has_swapped resets; swap returns the stored piece
    s, *_ = step(s, jnp.int32(A.hard_drop))
    assert not bool(s.has_swapped)
    s, *_ = step(s, jnp.int32(A.swap))
    assert int(s.piece) == p0  # full holder: trades with the stored piece


def test_swap_preserves_orientation():
    cfg = EngineConfig(gravity_enabled=False)
    s = _state(8, cfg)
    step = _jit_step(cfg)
    s, *_ = step(s, jnp.int32(A.rotate_clockwise))
    rot = int(s.rotation)
    p0 = int(s.piece)
    s, *_ = step(s, jnp.int32(A.swap))  # store rotated piece
    s, *_ = step(s, jnp.int32(A.hard_drop))  # unlock swapping
    s, *_ = step(s, jnp.int32(A.swap))  # retrieve it
    assert int(s.piece) == p0
    assert int(s.rotation) == rot


def test_line_clear_reward_classic():
    """Drop a vertical I into a prepared gap -> (lines**2)*width + alife."""
    cfg = EngineConfig(gravity_enabled=False)
    s = _state(0, cfg)
    # force a horizontal I piece
    s = s.replace(piece=jnp.int32(0), rotation=jnp.int32(0))
    H, W, P = cfg.height, cfg.width, cfg.padding
    board = np.asarray(s.board).copy()
    # fill the bottom row except 4 cells under the I's columns
    board[H - 1, P : P + W] = 2
    board[H - 1, P + 3 : P + 7] = 0
    s = s.replace(board=jnp.asarray(board), x=jnp.int32(P + 3))
    step = _jit_step(cfg)
    s, _, r, d, info = step(s, jnp.int32(A.hard_drop))
    assert int(info["lines_cleared"]) == 1
    assert float(r) == 1 * 1 * W + 1  # line reward + alife
    # row cleared
    assert np.asarray(s.board)[H - 1, P:-P].sum() == 0


def test_auto_reset():
    cfg = EngineConfig(gravity_enabled=False, auto_reset=True)
    s = _state(4, cfg)
    step = _jit_step(cfg)
    for i in range(60):
        s, obs, r, d, _ = step(s, jnp.int32(A.hard_drop))
        if bool(d):
            break
    assert bool(d), "hard-drop spam should top out"
    # the returned state is already a fresh episode
    assert not bool(s.game_over)
    assert int(s.steps) == 0
    assert float(s.score) == 0.0
    assert int(np.asarray(s.board)[: cfg.height, cfg.padding : -cfg.padding].sum()) == 0


def test_freeze_without_auto_reset():
    cfg = EngineConfig(gravity_enabled=False, auto_reset=False)
    s = _state(4, cfg)
    step = _jit_step(cfg)
    for _ in range(60):
        s, obs, r, d, _ = step(s, jnp.int32(A.hard_drop))
        if bool(d):
            break
    assert bool(d)
    board = np.asarray(s.board)
    s2, _, r2, d2, _ = step(s, jnp.int32(A.hard_drop))
    assert bool(d2) and float(r2) == 0.0
    assert np.array_equal(np.asarray(s2.board), board)


def test_observe_dict_shapes_and_content():
    s = _state(6)
    obs = engine.jit_observe(CFG)(s)
    assert obs["board"].shape == (CFG.padded_height, CFG.padded_width)
    assert obs["active_tetromino_mask"].shape == obs["board"].shape
    assert obs["holder"].shape == (CFG.padding, CFG.padding * CFG.holder_size)
    assert obs["queue"].shape == (CFG.padding, CFG.padding * CFG.queue_size)
    # empty holder renders as bedrock
    assert np.all(np.asarray(obs["holder"]) == 1)
    # the active piece's cells appear in the board image
    pid = int(PIECES.ids[int(s.piece)])
    assert (np.asarray(obs["board"]) == pid).sum() == 4
    # mask covers the piece's box
    box = int(PIECES.box[int(s.piece)])
    assert int(np.asarray(obs["active_tetromino_mask"]).sum()) == box * box


def test_batched_engine_and_rollout():
    B, T = 16, 50
    cfg = EngineConfig(auto_reset=True)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = engine.batched_reset(keys, config=cfg)
    assert states.board.shape[0] == B
    rng = np.random.default_rng(0)
    acts = jnp.asarray(rng.integers(0, 8, size=(T, B)), dtype=jnp.int32)
    final, (o, r, d, l) = jax.jit(lambda s, a: engine.rollout(s, a, cfg))(states, acts)
    assert o.shape == (T, B, cfg.height, cfg.width)
    assert np.asarray(r).shape == (T, B)
    # per-env independent streams -> boards diverge
    assert not np.array_equal(np.asarray(final.board[0]), np.asarray(final.board[1]))
