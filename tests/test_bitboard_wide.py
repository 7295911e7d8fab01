"""Equivalence: multi-word bit kernels vs the einsum kernels on WIDE boards.

Same pinning strategy as tests/test_bitboard.py — ops.board is the
parity-tested semantic spec (bit-exact with the reference functional core)
and the packed kernels must agree on every board/piece/position including
out-of-range starts — but on geometries whose padded width exceeds one
uint32 word (the single-word module's static limit).  Word-boundary
straddles are exercised explicitly: every x in the full padded range is
probed for collision, so the low/high carry split sees all 32 offsets.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.ops import bitboard_wide as bw
from tetris_gymnasium_tpu.ops import board as ob
from tetris_gymnasium_tpu.pieces import PIECES, piece_matrix

# (height, width, padding): padded widths 38 (2 words) and 69 (3 words);
# 36 hits the word-0 bit-31 edge in the playfield mask.
GEOMETRIES = [(20, 30, 4), (14, 28, 4), (12, 61, 4)]


def dims(geom):
    H, W, PAD = geom
    return H, W, PAD, H + PAD, W + 2 * PAD


def random_board(geom, seed: int, fill: float) -> jnp.ndarray:
    H, W, PAD, HP, WP = dims(geom)
    r = np.random.default_rng(seed)
    inner = np.where(r.random((H, W)) < fill, r.integers(2, 9, (H, W)), 0)
    board = np.pad(inner, ((0, PAD), (PAD, PAD)), constant_values=1)
    return jnp.asarray(board, dtype=jnp.int8)


def all_piece_configs():
    for p in range(7):
        for r in range(4):
            yield p, r


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_pack_board_roundtrip(geom):
    H, W, PAD, HP, WP = dims(geom)
    board = random_board(geom, 0, 0.4)
    rows = bw.pack_board(board)
    assert rows.shape == (HP, bw.n_words(WP))
    unpacked = (
        rows[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    ) & 1
    flat = np.asarray(unpacked).reshape(HP, -1)[:, :WP]
    np.testing.assert_array_equal(flat, np.asarray(board > 0))


@pytest.mark.parametrize("geom", GEOMETRIES)
@pytest.mark.parametrize("fill", [0.0, 0.35, 0.9])
def test_collision_equivalence_every_x(geom, fill):
    """Every x in the padded range: the carry split sees all 32 offsets."""
    H, W, PAD, HP, WP = dims(geom)
    board = random_board(geom, int(fill * 10) + 1, fill)
    rows = bw.pack_board(board)
    rtab = bw.row_bits_table(PIECES)
    r = np.random.default_rng(7)
    for p, rot in all_piece_configs():
        mat = piece_matrix(PIECES.jx(), jnp.int32(p), jnp.int32(rot))
        rb = bw.piece_row_bits(rtab, jnp.int32(p), jnp.int32(rot))
        for x in range(-2, WP + 2):
            y = int(r.integers(-2, HP + 2))
            want = bool(ob.collision(board, mat, jnp.int32(x), jnp.int32(y)))
            got = bool(bw.collision(rows, rb, jnp.int32(x), jnp.int32(y), WP))
            assert got == want, (p, rot, x, y)


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_drop_distance_equivalence(geom):
    H, W, PAD, HP, WP = dims(geom)
    board = random_board(geom, 5, 0.35)
    rows = bw.pack_board(board)
    rtab = bw.row_bits_table(PIECES)
    r = np.random.default_rng(11)
    for p, rot in all_piece_configs():
        mat = piece_matrix(PIECES.jx(), jnp.int32(p), jnp.int32(rot))
        rb = bw.piece_row_bits(rtab, jnp.int32(p), jnp.int32(rot))
        for x in range(0, WP - 3, 3):
            y = int(r.integers(0, HP))
            want = int(ob.drop_distance(board, mat, jnp.int32(x), jnp.int32(y)))
            got = int(bw.drop_distance(rows, rb, jnp.int32(x), jnp.int32(y), WP))
            assert got == want, (p, rot, x, y)


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_project_equivalence(geom):
    H, W, PAD, HP, WP = dims(geom)
    board = random_board(geom, 8, 0.3)
    rows = bw.pack_board(board)
    rtab = bw.row_bits_table(PIECES)
    r = np.random.default_rng(13)
    for p, rot in all_piece_configs():
        mat = piece_matrix(PIECES.jx(), jnp.int32(p), jnp.int32(rot))
        rb = bw.piece_row_bits(rtab, jnp.int32(p), jnp.int32(rot))
        for x in range(0, WP - 3, 2):
            y = jnp.int32(int(r.integers(0, HP - 3)))
            want = bw.pack_board(ob.project(board, mat, jnp.int32(x), y, jnp.int8(2)))
            got = bw.project(rows, rb, jnp.int32(x), y, WP)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def make_filled_board(geom, filled_rows_idx):
    H, W, PAD, HP, WP = dims(geom)
    inner = np.zeros((H, W), dtype=np.int8)
    r = np.random.default_rng(42)
    inner[r.random((H, W)) < 0.3] = 3
    for i in filled_rows_idx:
        inner[i] = 2
    for i in range(H):
        if i not in filled_rows_idx:
            inner[i, r.integers(0, W)] = 0
    return jnp.asarray(np.pad(inner, ((0, PAD), (PAD, PAD)), constant_values=1))


@pytest.mark.parametrize("geom", GEOMETRIES)
@pytest.mark.parametrize("filled", [[], [0], [5, 6, 7, 8], [0, 3, 11]])
def test_clear_lines_equivalence(geom, filled):
    H, W, PAD, HP, WP = dims(geom)
    board = make_filled_board(geom, filled)
    rows = bw.pack_board(board)
    want_board, want_n = ob.clear_lines(board, H, W, PAD)
    got_rows, got_n, got_filled = bw.clear_lines(rows, H, W, PAD)
    assert int(got_n) == int(want_n) == len(filled)
    np.testing.assert_array_equal(
        np.asarray(got_rows), np.asarray(bw.pack_board(want_board))
    )
    inner = board[:H, PAD:-PAD]
    got_ids = bw.compact_ids(inner, got_filled)
    np.testing.assert_array_equal(
        np.asarray(got_ids), np.asarray(want_board[:H, PAD:-PAD])
    )


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_empty_rows_matches_create_board(geom):
    H, W, PAD, HP, WP = dims(geom)
    board = ob.create_board(H, W, PAD)
    np.testing.assert_array_equal(
        bw.empty_rows(H, W, PAD), np.asarray(bw.pack_board(board))
    )


def test_word0_bit31_in_playfield():
    """padded_width 36 puts playfield column 31 at word-0 bit 31: the uint32
    compaction matvec must carry it (an int32 matvec would corrupt it)."""
    H, W, PAD = 8, 28, 4  # WP = 36
    inner = np.zeros((H, W), dtype=np.int8)
    inner[H - 1] = 2  # bottom row full -> clears
    inner[H - 2, 27] = 3  # playfield col 27 = padded col 31 = word0 bit31
    board = jnp.asarray(np.pad(inner, ((0, PAD), (PAD, PAD)), constant_values=1))
    rows = bw.pack_board(board)
    want_board, want_n = ob.clear_lines(board, H, W, PAD)
    got_rows, got_n, _ = bw.clear_lines(rows, H, W, PAD)
    assert int(got_n) == int(want_n) == 1
    np.testing.assert_array_equal(
        np.asarray(got_rows), np.asarray(bw.pack_board(want_board))
    )
