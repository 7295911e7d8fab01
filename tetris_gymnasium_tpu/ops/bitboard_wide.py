"""Multi-word bit-packed board kernels: wide boards on the flagship path.

:mod:`tetris_gymnasium_tpu.ops.bitboard` packs each padded board row into
ONE ``uint32`` word, which caps the flagship/turbo engines at
``width + 2*padding <= 32``.  The reference OOP environment accepts any
geometry (ref: tetris_gymnasium/envs/tetris.py:77-107), so this module
generalises every row kernel to ``ceil(padded_width / 32)`` words per row:
rows are ``uint32[H, NW]``, a piece's x-shift splits into a low/high word
pair placed at dynamic word indices, hit maps OR across words, and line
masks become per-word constants.

The module mirrors the single-word API exactly (same function names and
signatures; the extra word axis is internal), so the engine selects the
kernel set at trace time from the static config::

    kb = bitboard if config.padded_width <= 32 else bitboard_wide

Standard boards keep the single-word module byte-for-byte — this module is
never traced for them, so the headline hot path is untouched.  Semantics
are pinned against the width-agnostic einsum kernels (:mod:`ops.board`) in
``tests/test_bitboard_wide.py`` the same way ``tests/test_bitboard.py``
pins the single-word module.

No ``uint64`` anywhere: TPU jax runs with ``jax_enable_x64=False``, so the
cross-word carry is a guarded 32-bit shift pair (a shift by 32 would be
undefined), and the per-word compaction matvec accumulates in ``uint32``
(word 0 legitimately uses bit 31 when ``padded_width >= 32``, which the
single-word module's int32 matvec could not represent).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Shared pieces of the single-word API: piece row masks always fit one word
# (a piece box is at most 5 columns), hit-map consumers are word-free, and
# id-image compaction never touches packed rows.
from tetris_gymnasium_tpu.ops.bitboard import (  # noqa: F401  (re-exports)
    _clamp_start,
    collision_at,
    compact_ids,
    drop_from_map,
    piece_row_bits,
    row_bits_table,
)
from tetris_gymnasium_tpu.pieces import PIECES, PieceSet  # noqa: F401


def n_words(width: int) -> int:
    """Words per packed row for a padded board ``width`` columns wide."""
    return (width + 31) // 32


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


def pack_board(board: jnp.ndarray) -> jnp.ndarray:
    """Occupancy bitmask rows ``uint32[H, NW]`` from an id board ``[H, W]``.

    Bit ``w % 32`` of word ``w // 32`` is set iff ``board[r, w] > 0``
    (single-word :func:`ops.bitboard.pack_board` semantics per word).
    """
    W = board.shape[1]
    occ = (board > 0).astype(jnp.uint32)
    words = []
    for j in range(n_words(W)):
        lo, hi = 32 * j, min(32 * (j + 1), W)
        weights = (jnp.uint32(1) << jnp.arange(hi - lo, dtype=jnp.uint32))[None, :]
        words.append(jnp.sum(occ[:, lo:hi] * weights, axis=1, dtype=jnp.uint32))
    return jnp.stack(words, axis=1)


def _mask_words(mask: int, nw: int) -> np.ndarray:
    """Split a Python big-int bitmask into ``uint32[nw]`` little-endian words."""
    return np.array([(mask >> (32 * j)) & 0xFFFFFFFF for j in range(nw)], dtype=np.uint32)


def side_mask_words(width: int, padding: int) -> np.ndarray:
    """Per-word bits of the left/right bedrock columns of a padded row."""
    lo = (1 << padding) - 1
    return _mask_words(lo | (lo << (padding + width)), n_words(width + 2 * padding))


def play_mask_words(width: int, padding: int) -> np.ndarray:
    """Per-word bits of the playfield columns of a padded row."""
    return _mask_words(((1 << width) - 1) << padding, n_words(width + 2 * padding))


def empty_rows(height: int, width: int, padding: int) -> np.ndarray:
    """Packed rows of an empty padded board ``uint32[H, NW]`` (host constant)."""
    pw = width + 2 * padding
    side = side_mask_words(width, padding)
    full = _mask_words((1 << pw) - 1, n_words(pw))
    rows = np.tile(side, (height + padding, 1))
    rows[height:] = full
    return rows


# ---------------------------------------------------------------------------
# Piece placement across word boundaries
# ---------------------------------------------------------------------------


def shift_piece(rb: jnp.ndarray, x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Piece row masks at absolute board columns: ``uint32[S, NW]``.

    ``rb`` holds the piece's rows in bits ``0..S-1`` of single words; the
    (clamped, dynamic_slice-normalised) window start ``x`` splits each into
    a low word ``rb << (x % 32)`` at word ``x // 32`` and a carry word
    ``rb >> (32 - x % 32)`` at the next index.  The carry shift is guarded:
    when ``x % 32 == 0`` a shift by 32 would be undefined in XLA, and the
    carry is zero anyway.
    """
    size = rb.shape[0]
    nw = n_words(width)
    xc = _clamp_start(x, width - size, width)
    word = (xc // 32).astype(jnp.int32)
    off = (xc % 32).astype(jnp.uint32)
    lo = rb << off  # [S]
    hi = jnp.where(off == 0, jnp.uint32(0), rb >> (jnp.uint32(32) - off))
    j = jnp.arange(nw, dtype=jnp.int32)[None, :]  # [1, NW]
    return jnp.where(j == word, lo[:, None], jnp.uint32(0)) | jnp.where(
        j == word + 1, hi[:, None], jnp.uint32(0)
    )


def hit_map(rows: jnp.ndarray, sp: jnp.ndarray) -> jnp.ndarray:
    """Overlap flags at every vertical offset, OR-reduced across words.

    ``rows`` is ``uint32[H, NW]``, ``sp`` the x-shifted piece rows
    ``uint32[S, NW]``; output is ``bool[H]`` exactly like the single-word
    :func:`ops.bitboard.hit_map`, so ``collision_at`` / ``drop_from_map``
    are shared unchanged.
    """
    acc = rows & sp[0]
    for i in range(1, sp.shape[0]):
        shifted = jnp.concatenate(
            [rows[i:], jnp.zeros((i, rows.shape[1]), dtype=jnp.uint32)], axis=0
        )
        acc = acc | (shifted & sp[i])
    return jnp.any(acc != 0, axis=1)


def collision(
    rows: jnp.ndarray, rb: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, width: int
) -> jnp.ndarray:
    """True iff the piece overlaps occupancy at window (x, y) — bit-exact
    with :func:`ops.board.collision` on the unpacked image."""
    sp = shift_piece(rb, x, width)
    hm = hit_map(rows, sp)
    return collision_at(hm, y, rb.shape[0])


def drop_distance(
    rows: jnp.ndarray, rb: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, width: int
) -> jnp.ndarray:
    """Closed-form hard-drop distance; equals :func:`ops.board.drop_distance`."""
    sp = shift_piece(rb, x, width)
    hm = hit_map(rows, sp)
    return drop_from_map(hm, y, rb.shape[0])


def project(
    rows: jnp.ndarray, rb: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, width: int
) -> jnp.ndarray:
    """OR the piece into the occupancy rows at the (clamped) window (x, y)."""
    H = rows.shape[0]
    size = rb.shape[0]
    sp = shift_piece(rb, x, width)  # [S, NW]
    yc = _clamp_start(y, H - size, H)
    idx = jnp.arange(H, dtype=jnp.int32)[:, None]  # [H, 1]
    sel = (idx == yc + jnp.arange(size, dtype=jnp.int32)[None, :]).astype(jnp.uint32)
    add = jnp.sum(sel[:, :, None] * sp[None, :, :], axis=1, dtype=jnp.uint32)
    return rows | add


# ---------------------------------------------------------------------------
# Line clear
# ---------------------------------------------------------------------------


def filled_rows(rows: jnp.ndarray, height: int, width: int, padding: int) -> jnp.ndarray:
    """``bool[height]``: playfield rows whose every cell is occupied
    (per-word mask compare, AND-reduced across words)."""
    pm = jnp.asarray(play_mask_words(width, padding))[None, :]
    inner = rows[:height]
    return jnp.all((inner & pm) == pm, axis=1)


def clear_lines(
    rows: jnp.ndarray, height: int, width: int, padding: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clear filled rows, compact downward; returns (rows', n, filled).

    The single-word destination-permutation matvec applied per word; the
    accumulation stays ``uint32`` because word 0 can carry bit 31.
    """
    filled = filled_rows(rows, height, width, padding)
    n = jnp.sum(filled.astype(jnp.int32))

    keep = (~filled).astype(jnp.int32)
    dest = jnp.cumsum(keep) - 1 + n  # [height]
    perm = (
        (jnp.arange(height, dtype=jnp.int32)[:, None] == dest[None, :]).astype(jnp.int32)
        * keep[None, :]
    ).astype(jnp.uint32)
    inner = rows[:height]  # [height, NW]
    compacted = jnp.sum(perm[:, :, None] * inner[None, :, :], axis=1, dtype=jnp.uint32)
    compacted = compacted | jnp.asarray(side_mask_words(width, padding))[None, :]
    new_rows = jnp.concatenate([compacted, rows[height:]])
    return new_rows, n, filled
