"""Unit tests for the core board kernels (ops/board.py).

Mirrors the reference's per-op unit coverage
(ref: tests/test_functional/test_core/) with the addition of an exhaustive
closed-form-drop vs while-loop equivalence check — the one op whose
implementation intentionally diverges from the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EnvConfig
from tetris_gymnasium_tpu.ops.board import (
    clear_lines,
    collision,
    create_board,
    drop_distance,
    gravity_step,
    hard_drop,
    project,
    score_classic,
    score_fn,
    spawn_xy_fn,
)
from tetris_gymnasium_tpu.pieces import PIECES

CFG = EnvConfig()
H, W, P = CFG.height, CFG.width, CFG.padding


def test_create_board_geometry():
    board = create_board(H, W, P)
    assert board.shape == (H + P, W + 2 * P)
    assert board.dtype == jnp.int8
    # playfield empty
    assert np.all(np.asarray(board[:H, P:-P]) == 0)
    # bedrock frame left/right/bottom, no top padding
    assert np.all(np.asarray(board[:, :P]) == 1)
    assert np.all(np.asarray(board[:, -P:]) == 1)
    assert np.all(np.asarray(board[-P:, :]) == 1)
    assert np.all(np.asarray(board[0, P:-P]) == 0)


def test_collision_empty_and_walls():
    board = create_board(H, W, P)
    mat = PIECES.matrices[0, 0]  # I piece, horizontal (row 1 filled)
    assert not bool(collision(board, mat, jnp.int32(P), jnp.int32(0)))
    # overlapping the left bedrock
    assert bool(collision(board, mat, jnp.int32(P - 1), jnp.int32(0)))
    # resting on the floor: I occupies row y+1 -> collides when y+1 >= H
    assert not bool(collision(board, mat, jnp.int32(P), jnp.int32(H - 2)))
    assert bool(collision(board, mat, jnp.int32(P), jnp.int32(H - 1)))


def test_collision_with_stack():
    board = create_board(H, W, P)
    board = board.at[H - 1, P + 2].set(5)  # one locked cell
    mat = PIECES.matrices[1, 0]  # O piece occupies rows 0-1, cols 0-1
    assert bool(collision(board, mat, jnp.int32(P + 1), jnp.int32(H - 2)))
    assert not bool(collision(board, mat, jnp.int32(P + 3), jnp.int32(H - 2)))


def test_project_stamps_ids():
    board = create_board(H, W, P)
    mat = PIECES.matrices[1, 0]  # O piece
    out = project(board, mat, jnp.int32(P), jnp.int32(0), PIECES.ids[1])
    sec = np.asarray(out[0:2, P : P + 2])
    assert np.all(sec == 3)  # O id is 3
    # rest of playfield untouched
    assert np.asarray(out[:H, P:-P]).sum() == 4 * 3


@pytest.mark.parametrize("n_rows", [0, 1, 2, 3, 4])
def test_clear_lines_counts_and_compacts(n_rows):
    board = create_board(H, W, P)
    # fill the bottom n_rows of the playfield
    for r in range(n_rows):
        board = board.at[H - 1 - r, P:-P].set(2)
    # one marker cell above the filled rows
    board = board.at[H - 1 - n_rows, P].set(7)
    out, n = clear_lines(board, H, W, P)
    assert int(n) == n_rows
    # marker fell to the bottom row of the playfield
    assert int(out[H - 1, P]) == 7
    # playfield above is empty again
    assert np.asarray(out[: H - 1, P:-P]).sum() == 0
    # bedrock intact
    assert np.all(np.asarray(out[-P:, :]) == 1)


def test_clear_lines_no_fill_is_identity():
    board = create_board(H, W, P)
    board = board.at[H - 1, P].set(4)
    out, n = clear_lines(board, H, W, P)
    assert int(n) == 0
    assert np.array_equal(np.asarray(out), np.asarray(board))


def _naive_drop(board, piece, x, y):
    """Literal re-statement of the reference while_loop semantics."""
    board = np.asarray(board)
    piece = np.asarray(piece)
    Hb, Wb = board.shape
    ph, pw = piece.shape

    def hits(yy):
        ys, xs = min(max(int(yy), 0), Hb - ph), min(max(int(x), 0), Wb - pw)
        sec = board[ys : ys + ph, xs : xs + pw]
        return bool(np.any((sec > 0) & (piece > 0)))

    d = 0
    while not hits(y + d + 1):
        d += 1
        if d > Hb:  # degenerate board: reference loop would not terminate
            break
    return d


def test_drop_distance_matches_while_loop_everywhere():
    """Closed-form drop == first-collision loop for random boards/pieces."""
    rng = np.random.default_rng(7)
    board0 = np.asarray(create_board(H, W, P))
    for trial in range(200):
        board = board0.copy()
        # random stack with overhangs
        junk = rng.random((H, W)) < rng.uniform(0.0, 0.4)
        board[:H, P:-P] = np.where(junk, 2, board[:H, P:-P])
        piece_idx = rng.integers(0, 7)
        rot = rng.integers(0, 4)
        piece = np.asarray(PIECES.matrices[piece_idx, rot])
        x = int(rng.integers(P - 1, W + P))
        y = int(rng.integers(0, 4))
        got = int(drop_distance(jnp.asarray(board), jnp.asarray(piece), jnp.int32(x), jnp.int32(y)))
        want = _naive_drop(board, piece, x, y)
        assert got == min(want, H + P), (trial, piece_idx, rot, x, y, got, want)


def test_hard_drop_reward():
    board = create_board(H, W, P)
    mat = PIECES.matrices[0, 0]  # horizontal I at row y+1
    new_y, reward = hard_drop(board, mat, jnp.int32(P), jnp.int32(0))
    # falls until its filled row (y+1) reaches the last playfield row (H-1)
    assert int(new_y) == H - 2
    assert int(reward) == 2 * (H - 2)


def test_gravity_step():
    board = create_board(H, W, P)
    mat = PIECES.matrices[1, 0]
    assert int(gravity_step(board, mat, jnp.int32(P), jnp.int32(0))) == 1
    assert int(gravity_step(board, mat, jnp.int32(P), jnp.int32(H - 2))) == H - 2


def test_scores():
    assert [int(score_fn(jnp.int32(n))) for n in range(5)] == [0, 100, 300, 500, 800]
    assert [int(score_classic(jnp.int32(n), W)) for n in range(5)] == [0, 10, 40, 90, 160]


def test_spawn_xy_fn_is_piece_independent():
    x, y = spawn_xy_fn(CFG)
    assert (x, y) == ((W + 2 * P) // 2 - 2, 0)


def test_ops_jit_equivalence():
    """jit(f) == f for every core op (ref pattern: test_jax_compat.py:21-53)."""
    board = create_board(H, W, P)
    board = board.at[H - 1, P:-P].set(2)
    mat = PIECES.matrices[2, 1]
    args = (board, mat, jnp.int32(P + 3), jnp.int32(2))
    assert bool(jax.jit(collision)(*args)) == bool(collision(*args))
    assert int(jax.jit(drop_distance)(*args)) == int(drop_distance(*args))
    j_clear = jax.jit(clear_lines, static_argnums=(1, 2, 3))
    a, na = j_clear(board, H, W, P)
    b, nb = clear_lines(board, H, W, P)
    assert np.array_equal(np.asarray(a), np.asarray(b)) and int(na) == int(nb)
