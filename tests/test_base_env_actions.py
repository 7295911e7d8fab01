"""Per-concern engine behavior pins: movement, rotation, swap, scoring.

Mirrors the reference's per-concern OOP suites
(ref: tests/test_base_env/actions/test_base_env_movement.py,
test_base_env_rotation.py, test_base_env_swap.py,
reward/test_base_env_scoring.py) with surgically-constructed states, so the
edge cases are pinned directly rather than only via trajectory-parity scans.
The turbo engine inherits every pin through its field-for-field equivalence
suite (tests/test_turbo.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EngineConfig, RewardsMapping, ActionsMapping
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.ops.board import create_board
from tetris_gymnasium_tpu.pieces import PIECES

A = ActionsMapping()
R = RewardsMapping()
CFG = EngineConfig()  # gravity on
CFG_NG = EngineConfig(gravity_enabled=False)
H, W, P = CFG.height, CFG.width, CFG.padding
PW = CFG.padded_width

I_PIECE, O_PIECE = 0, 1  # box 4 / box 2, ids 2 / 3


def fresh(cfg=CFG, piece=I_PIECE, rotation=0, x=None, y=0, board=None):
    """Deterministic state: chosen piece/pose on a chosen (default empty) board."""
    s = engine.init_state(jax.random.PRNGKey(0), cfg)
    if x is None:
        x = PW // 2 - int(PIECES.box[piece]) // 2  # classic spawn column
    repl = dict(
        piece=jnp.int32(piece), rotation=jnp.int32(rotation),
        x=jnp.int32(x), y=jnp.int32(y),
    )
    if board is not None:
        repl["board"] = jnp.asarray(board, dtype=jnp.int8)
    return s.replace(**repl)


def step(s, action, cfg=CFG):
    return engine.step(s, jnp.int32(action), cfg, obs_fn=lambda *_: ())


# -- movement (ref: actions/test_base_env_movement.py) ------------------------


def test_move_right_free():
    s = fresh(x=7, y=2)
    s2, *_ = step(s, A.move_right)
    assert int(s2.x) == 8


def test_move_left_free():
    s = fresh(x=7, y=2)
    s2, *_ = step(s, A.move_left)
    assert int(s2.x) == 6


def test_move_down_adds_gravity():
    """move_down = 1 (action) + 1 (gravity) cells when both are free."""
    s = fresh(y=5)
    s2, *_ = step(s, A.move_down)
    assert int(s2.y) == 7


def test_move_down_without_gravity_is_one_cell():
    s = fresh(cfg=CFG_NG, y=5)
    s2, *_ = step(s, A.move_down, CFG_NG)
    assert int(s2.y) == 6


def test_move_left_at_wall_blocked():
    """Horizontal I at the left wall: its filled cells sit at window cols
    0..3, so x = padding is the wall pose and move_left must be rejected."""
    s = fresh(cfg=CFG_NG, x=P, y=2)
    s2, *_ = step(s, A.move_left, CFG_NG)
    assert int(s2.x) == P


def test_move_right_at_wall_blocked():
    s = fresh(cfg=CFG_NG, x=P + W - 4, y=2)  # I occupies the last 4 play cols
    s2, *_ = step(s, A.move_right, CFG_NG)
    assert int(s2.x) == P + W - 4


def test_move_down_at_bottom_locks_and_respawns():
    """Blocked gravity commits the piece: the stack gains the I, a new piece
    spawns at the top (ref: envs/tetris.py:258-264 gravity-commit branch)."""
    s = fresh(y=H - 2)  # filled row of the I box is row 1 -> resting on bedrock
    s2, _, reward, done, info = step(s, A.no_op)
    assert not bool(done)
    assert int(s2.y) == 0  # respawned
    board = np.asarray(s2.board)
    x = int(s.x)  # horizontal I spans window cols 0..3 at its x
    assert np.all(board[H - 1, x : x + 4] == PIECES.ids[I_PIECE])
    assert float(reward) == R.alife


def test_move_right_blocked_by_stack():
    board = np.asarray(create_board(H, W, P)).copy()
    board[:H, 7 + 4 : 7 + 8] = 2  # wall of cells right of the piece window
    s = fresh(cfg=CFG_NG, x=7, y=2, board=board)
    s2, *_ = step(s, A.move_right, CFG_NG)
    assert int(s2.x) == 7


def test_move_left_blocked_by_stack():
    board = np.asarray(create_board(H, W, P)).copy()
    board[:H, 7 - 4 : 7] = 2
    s = fresh(cfg=CFG_NG, x=7, y=2, board=board)
    s2, *_ = step(s, A.move_left, CFG_NG)
    assert int(s2.x) == 7


def test_move_down_blocked_by_stack():
    board = np.asarray(create_board(H, W, P)).copy()
    board[8:H, P : P + W] = 2  # stack top at row 8
    s = fresh(cfg=CFG_NG, x=P, y=5, board=board)  # I filled row at y+1 = 6
    s2, *_ = step(s, A.move_down, CFG_NG)
    assert int(s2.y) == 6  # moved once (7 would overlap), not twice


def test_multiple_consecutive_moves_left():
    s = fresh(cfg=CFG_NG, x=9, y=2)
    for _ in range(3):
        s, *_ = step(s, A.move_left, CFG_NG)
    assert int(s.x) == 6


def test_gravity_pulls_one_cell_per_step():
    s = fresh(y=3)
    s2, *_ = step(s, A.no_op)
    assert int(s2.y) == 4


# -- rotation (ref: actions/test_base_env_rotation.py) ------------------------


def test_rotate_clockwise_free():
    s = fresh(cfg=CFG_NG, y=2)
    s2, *_ = step(s, A.rotate_clockwise, CFG_NG)
    assert int(s2.rotation) == 1
    # rotation table index k = rot90(m, k), matching the reference's
    # "clockwise" convention (ref: envs/tetris.py:429-443 uses k=+1 for cw)
    np.testing.assert_array_equal(
        PIECES.matrices[I_PIECE, 1], np.rot90(PIECES.matrices[I_PIECE, 0], 1)
    )


def test_rotate_counterclockwise_free():
    s = fresh(cfg=CFG_NG, y=2)
    s2, *_ = step(s, A.rotate_counterclockwise, CFG_NG)
    assert int(s2.rotation) == 3


def test_full_360_returns_to_original():
    s = fresh(cfg=CFG_NG, y=2)
    for _ in range(4):
        s, *_ = step(s, A.rotate_clockwise, CFG_NG)
    assert int(s.rotation) == 0


@pytest.mark.parametrize("action", ["rotate_clockwise", "rotate_counterclockwise"])
def test_rotate_blocked_by_stack(action):
    """Vertical I in a one-cell-wide well: any rotation overlaps the stack."""
    board = np.asarray(create_board(H, W, P)).copy()
    board[:H, P : P + W] = 2
    board[:, P + 3] = 0  # one empty column at play col 3
    s = fresh(cfg=CFG_NG, rotation=1, x=P + 2, y=4, board=board)  # I fills col P+3
    s2, *_ = step(s, getattr(A, action), CFG_NG)
    assert int(s2.rotation) == 1


def test_rotate_blocked_by_wall():
    """Horizontal I hugging the left wall cannot rotate into bedrock."""
    s = fresh(cfg=CFG_NG, rotation=1, x=P - 1, y=2)  # vertical I at play col 0
    s2, *_ = step(s, A.rotate_clockwise, CFG_NG)
    # cw pose occupies window row 2 cols 0..3 -> col P-1 is bedrock
    assert int(s2.rotation) == 1


# -- swap (ref: actions/test_base_env_swap.py) ---------------------------------


def test_first_swap_stores_piece_and_spawns_from_queue():
    s = fresh(cfg=CFG_NG, y=3)
    expected_next = int(s.queue[0])
    s2, *_ = step(s, A.swap, CFG_NG)
    assert int(s2.holder_count) == 1
    assert int(s2.holder_piece[0]) == I_PIECE
    assert int(s2.piece) == expected_next
    assert bool(s2.has_swapped)
    assert int(s2.y) == 0  # spawn pose
    assert int(s2.rotation) == 0


def test_swap_exchanges_after_drop():
    s = fresh(cfg=CFG_NG, rotation=0, y=2)
    s, *_ = step(s, A.swap, CFG_NG)  # store I, spawn queue head
    s, *_ = step(s, A.hard_drop, CFG_NG)  # resets has_swapped
    assert not bool(s.has_swapped)
    s, *_ = step(s, A.swap, CFG_NG)  # holder full: exchange
    assert int(s.piece) == I_PIECE  # the original piece comes back
    assert bool(s.has_swapped)


def test_double_swap_blocked():
    s = fresh(cfg=CFG_NG, y=3)
    s1, *_ = step(s, A.swap, CFG_NG)
    piece_after_first = int(s1.piece)
    s2, *_ = step(s1, A.swap, CFG_NG)
    assert int(s2.piece) == piece_after_first
    assert int(s2.holder_count) == int(s1.holder_count)


def test_has_swapped_resets_after_lock():
    s = fresh(cfg=CFG_NG, y=3)
    s, *_ = step(s, A.swap, CFG_NG)
    assert bool(s.has_swapped)
    s, *_ = step(s, A.hard_drop, CFG_NG)
    assert not bool(s.has_swapped)


def test_swap_preserves_stored_orientation():
    """The holder stores the piece's orientation (ref holder stores the
    Tetromino object incl. rotation, components/tetromino_holder.py:31-48)."""
    s = fresh(cfg=CFG_NG, rotation=1, y=2)
    s, *_ = step(s, A.swap, CFG_NG)
    assert int(s.holder_rotation[0]) == 1
    s, *_ = step(s, A.hard_drop, CFG_NG)
    s, *_ = step(s, A.swap, CFG_NG)
    assert int(s.piece) == I_PIECE and int(s.rotation) == 1


# -- scoring (ref: reward/test_base_env_scoring.py) ----------------------------


@pytest.mark.parametrize("lines", [0, 1, 2, 3, 4])
def test_score_matrix(lines):
    """Hard drop completing n rows rewards alife + (n**2) * width."""
    board = np.asarray(create_board(H, W, P)).copy()
    if lines:
        board[H - lines : H, P : P + W] = 2
        board[H - lines : H, P] = 0  # leave play column 0 open
    # vertical I fills window col 1 -> play col 0 at x = P - 1
    s = fresh(cfg=CFG_NG, rotation=1, x=P - 1, y=0, board=board)
    s2, _, reward, done, info = step(s, A.hard_drop, CFG_NG)
    assert not bool(done)
    assert int(info["lines_cleared"]) == lines
    assert float(reward) == pytest.approx(R.alife + lines * lines * W)


def test_game_over_reward():
    board = np.asarray(create_board(H, W, P)).copy()
    board[:H, P : P + W] = 2
    s = fresh(cfg=CFG_NG, y=0, board=board)
    s2, _, reward, done, _ = step(s, A.hard_drop, CFG_NG)
    assert bool(done)
    assert float(reward) == R.game_over


# -- hard drop at the extremes (VERDICT round-1 weak #7) ------------------------


@pytest.mark.parametrize("rotation", [0, 1, 2, 3])
@pytest.mark.parametrize("side", ["left", "right"])
def test_i_piece_hard_drop_at_walls_all_rotations(rotation, side):
    """Walk the I piece into the wall in every rotation, then hard drop:
    the lock never writes into bedrock and always adds exactly 4 cells."""
    s = fresh(cfg=CFG_NG, rotation=rotation, y=0)
    mover = A.move_left if side == "left" else A.move_right
    for _ in range(W + P):
        s, *_ = step(s, mover, CFG_NG)
    bedrock_before = np.asarray(s.board) == 1
    cells_before = int((np.asarray(s.board) > 1).sum())
    s2, _, reward, done, _ = step(s, A.hard_drop, CFG_NG)
    assert not bool(done)
    board2 = np.asarray(s2.board)
    assert np.array_equal(board2 == 1, bedrock_before)  # bedrock untouched
    assert int((board2 > 1).sum()) == cells_before + 4


@pytest.mark.parametrize("piece", range(7))
def test_every_piece_spawn_drop_is_sound(piece):
    """Spawn-drop each piece on an empty board: 4 cells, no termination."""
    s = fresh(cfg=CFG_NG, piece=piece, y=0)
    s2, _, reward, done, _ = step(s, A.hard_drop, CFG_NG)
    assert not bool(done)
    assert int((np.asarray(s2.board) > 1).sum()) == 4
    assert float(reward) == R.alife


# -- bag integrity across real refills (VERDICT round-1 weak #8) ---------------


def test_bag_draw_sequence_is_seven_bag_across_refills():
    """Play a long game (drops spread over columns + swaps) and reconstruct
    the full draw sequence (initial active + queue + every queue backfill):
    chunked by 7 it must be a sequence of complete bags, across many real
    refills (no re-pinning).  Draw detection is exact: ``bag_index``
    advances by exactly one per draw (wrapping to 1 on a refill)."""
    cfg = EngineConfig(width=14, height=30, gravity_enabled=False)
    s = engine.init_state(jax.random.PRNGKey(123), cfg)
    draws = [int(s.piece)] + [int(p) for p in np.asarray(s.queue)]

    rng = np.random.default_rng(9)
    piece_i = 0
    while len(draws) < 42 and not bool(s.game_over):
        # spread pieces over the (large) board to survive many bags
        shift = int(rng.integers(-6, 7))
        mover = A.move_left if shift < 0 else A.move_right
        for _ in range(abs(shift)):
            s, *_ = step(s, mover, cfg)
        action = A.swap if (piece_i % 5 == 3) else A.hard_drop
        idx_before = int(s.bag_index)
        s, *_ = step(s, action, cfg)
        piece_i += 1
        idx_after = int(s.bag_index)
        drew = idx_after == idx_before + 1 or (idx_after == 1 and idx_before == 7)
        if drew:
            draws.append(int(s.queue[-1]))

    assert len(draws) >= 35, f"game ended after only {len(draws)} draws"
    for b in range(len(draws) // 7):
        window = sorted(draws[b * 7 : (b + 1) * 7])
        assert window == list(range(7)), f"bag {b} is not a permutation: {window}"
