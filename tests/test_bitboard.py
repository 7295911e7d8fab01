"""Equivalence: bit-packed kernels vs the einsum kernels of ops.board.

The einsum kernels are the parity-tested semantic spec (bit-exact with the
reference functional core, see tests/test_ops_board.py); the bit kernels must
agree on every board/piece/position — including out-of-range starts, where
both reproduce ``lax.dynamic_slice`` clamping.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.ops import bitboard as bb
from tetris_gymnasium_tpu.ops import board as ob
from tetris_gymnasium_tpu.ops import rng as orng
from tetris_gymnasium_tpu.pieces import PIECES, piece_matrix

H, W, PAD = 20, 10, 4
HP, WP = H + PAD, W + 2 * PAD


def random_board(seed: int, fill: float) -> jnp.ndarray:
    """A padded board with random stack cells (ids 2..8) in the playfield."""
    r = np.random.default_rng(seed)
    inner = np.where(r.random((H, W)) < fill, r.integers(2, 9, (H, W)), 0)
    board = np.pad(inner, ((0, PAD), (PAD, PAD)), constant_values=1)
    return jnp.asarray(board, dtype=jnp.int8)


def all_piece_configs():
    for p in range(7):
        for r in range(4):
            yield p, r


def test_pack_board_roundtrip():
    board = random_board(0, 0.4)
    rows = bb.pack_board(board)
    unpacked = (rows[:, None] >> jnp.arange(WP, dtype=jnp.uint32)[None, :]) & 1
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(board > 0))


def test_row_bits_match_matrices():
    table = bb.row_bits_table(PIECES)
    for p, r in all_piece_configs():
        mat = np.asarray(PIECES.matrices[p, r])
        for i in range(4):
            expected = sum(int(mat[i, j] > 0) << j for j in range(4))
            assert table[p, r, i] == expected


def test_piece_row_bits_lookup():
    for p, r in all_piece_configs():
        got = bb.piece_row_bits(bb.ROW_BITS, jnp.int32(p), jnp.int32(r))
        np.testing.assert_array_equal(np.asarray(got), bb.ROW_BITS[p, r])


@pytest.mark.parametrize("seed,fill", [(1, 0.0), (2, 0.3), (3, 0.6), (4, 0.95)])
def test_collision_equivalence(seed, fill):
    board = random_board(seed, fill)
    rows = bb.pack_board(board)
    r = np.random.default_rng(seed + 100)
    for p, rot in all_piece_configs():
        mat = piece_matrix(PIECES.jx(), jnp.int32(p), jnp.int32(rot))
        rb = bb.piece_row_bits(bb.ROW_BITS, jnp.int32(p), jnp.int32(rot))
        for _ in range(8):
            x = int(r.integers(-2, WP + 2))
            y = int(r.integers(-2, HP + 2))
            want = bool(ob.collision(board, mat, jnp.int32(x), jnp.int32(y)))
            got = bool(bb.collision(rows, rb, jnp.int32(x), jnp.int32(y), WP))
            assert got == want, (p, rot, x, y)


@pytest.mark.parametrize("seed,fill", [(5, 0.0), (6, 0.3), (7, 0.7)])
def test_drop_distance_equivalence(seed, fill):
    board = random_board(seed, fill)
    rows = bb.pack_board(board)
    r = np.random.default_rng(seed + 200)
    for p, rot in all_piece_configs():
        mat = piece_matrix(PIECES.jx(), jnp.int32(p), jnp.int32(rot))
        rb = bb.piece_row_bits(bb.ROW_BITS, jnp.int32(p), jnp.int32(rot))
        for _ in range(8):
            x = int(r.integers(0, WP - 3))
            y = int(r.integers(0, HP))
            want = int(ob.drop_distance(board, mat, jnp.int32(x), jnp.int32(y)))
            got = int(bb.drop_distance(rows, rb, jnp.int32(x), jnp.int32(y), WP))
            assert got == want, (p, rot, x, y)


def test_drop_distance_no_floor():
    """Degenerate floorless board: both kernels cap the drop at H."""
    board = jnp.zeros((HP, WP), dtype=jnp.int8)
    rows = bb.pack_board(board)
    mat = piece_matrix(PIECES.jx(), jnp.int32(1), jnp.int32(0))  # O piece
    rb = bb.piece_row_bits(bb.ROW_BITS, jnp.int32(1), jnp.int32(0))
    want = int(ob.drop_distance(board, mat, jnp.int32(8), jnp.int32(0)))
    got = int(bb.drop_distance(rows, rb, jnp.int32(8), jnp.int32(0), WP))
    assert got == want == HP


@pytest.mark.parametrize("seed", [8, 9])
def test_project_equivalence(seed):
    board = random_board(seed, 0.3)
    rows = bb.pack_board(board)
    r = np.random.default_rng(seed + 300)
    for p, rot in all_piece_configs():
        mat = piece_matrix(PIECES.jx(), jnp.int32(p), jnp.int32(rot))
        rb = bb.piece_row_bits(bb.ROW_BITS, jnp.int32(p), jnp.int32(rot))
        x = jnp.int32(int(r.integers(0, WP - 3)))
        y = jnp.int32(int(r.integers(0, HP - 3)))
        want = bb.pack_board(ob.project(board, mat, x, y, jnp.int8(2)))
        got = bb.project(rows, rb, x, y, WP)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def make_filled_board(filled_rows_idx):
    """Board with the given playfield rows fully filled, others random-ish."""
    inner = np.zeros((H, W), dtype=np.int8)
    r = np.random.default_rng(42)
    inner[r.random((H, W)) < 0.3] = 3
    for i in filled_rows_idx:
        inner[i] = 2
    # make sure non-listed rows are not accidentally full
    for i in range(H):
        if i not in filled_rows_idx:
            inner[i, r.integers(0, W)] = 0
    return jnp.asarray(np.pad(inner, ((0, PAD), (PAD, PAD)), constant_values=1))


@pytest.mark.parametrize(
    "filled", [[], [19], [18, 19], [0], [5, 6, 7, 8], [0, 10, 19]]
)
def test_clear_lines_equivalence(filled):
    board = make_filled_board(filled)
    rows = bb.pack_board(board)
    want_board, want_n = ob.clear_lines(board, H, W, PAD)
    got_rows, got_n, got_filled = bb.clear_lines(rows, H, W, PAD)
    assert int(got_n) == int(want_n) == len(filled)
    np.testing.assert_array_equal(
        np.asarray(got_rows), np.asarray(bb.pack_board(want_board))
    )
    # id-image compaction matches the einsum clear exactly
    inner = board[:H, PAD:-PAD]
    got_ids = bb.compact_ids(inner, got_filled)
    np.testing.assert_array_equal(
        np.asarray(got_ids), np.asarray(want_board[:H, PAD:-PAD])
    )


def test_empty_rows_matches_create_board():
    board = ob.create_board(H, W, PAD)
    np.testing.assert_array_equal(
        bb.empty_rows(H, W, PAD), np.asarray(bb.pack_board(board))
    )


# ---------------------------------------------------------------------------
# RNG
# ---------------------------------------------------------------------------


def test_rng_deterministic_and_distinct_streams():
    k = orng.seed_key(0, 0)
    k1, a = orng.next_bits(k)
    k2, b = orng.next_bits(k1)
    assert int(a) != int(b)
    # same seed -> same sequence
    _, a2 = orng.next_bits(orng.seed_key(0, 0))
    assert int(a) == int(a2)
    # different stream -> different sequence
    _, c = orng.next_bits(orng.seed_key(0, 1))
    assert int(a) != int(c)


def test_rng_randint_range_and_uniformity():
    k = orng.seed_key(123, 7)
    counts = np.zeros(7, dtype=int)
    for _ in range(700):
        k, v = orng.randint(k, 7)
        counts[int(v)] += 1
    assert counts.min() > 0
    # loose uniformity: each bucket within 40% of expectation
    assert counts.min() > 100 * 0.6 and counts.max() < 100 * 1.4


def test_rng_shuffle_is_permutation_and_varies():
    k = orng.seed_key(5, 9)
    perms = set()
    for _ in range(20):
        k, p = orng.shuffle(k, 7)
        p = tuple(int(v) for v in p)
        assert sorted(p) == list(range(7))
        perms.add(p)
    assert len(perms) > 10  # shuffles actually vary


def test_rng_shuffle_frequency():
    """Every piece appears in every bag slot with roughly uniform frequency."""
    k = orng.seed_key(11, 3)
    slot_counts = np.zeros((7, 7), dtype=int)
    n = 400
    for _ in range(n):
        k, p = orng.shuffle(k, 7)
        for slot, piece in enumerate(np.asarray(p)):
            slot_counts[slot, piece] += 1
    expected = n / 7
    assert slot_counts.min() > expected * 0.5
    assert slot_counts.max() < expected * 1.6


def test_rng_vmappable():
    keys = jnp.stack([orng.seed_key(0, i) for i in range(8)])
    ks, bits = jax.vmap(orng.next_bits)(keys)
    assert len(set(int(b) for b in bits)) == 8
