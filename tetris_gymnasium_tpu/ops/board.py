"""Core board kernels: collision, projection, drop, line clear, scoring.

These are the hot ops of the step function.  Design rules (TPU-first):
  * static shapes everywhere — boards are ``[H+pad, W+2*pad]`` int8;
  * no data-dependent Python control flow; the reference's ``while_loop``
    hard drop (ref: functional/core.py:230-251) is replaced by a closed-form
    first-collision scan that is O(1) depth under vmap (the reference loop
    serialises a whole batch on its slowest lane);
  * everything is written to fuse: one XLA program per step, VPU-only
    elementwise/gather work on tiny int8 tiles.

Semantics are bit-exact with the reference functional core
(ref: tetris_gymnasium/functional/core.py) including the index-clamping
behaviour of ``lax.dynamic_slice``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EnvConfig
from tetris_gymnasium_tpu.pieces import BEDROCK_ID, MAX_SIZE


def create_board(height: int, width: int, padding: int) -> jnp.ndarray:
    """Empty padded board: zeros inside, bedrock frame right/left/bottom.

    Ref parity: functional/core.py:46-63 (no top padding).
    """
    board = jnp.zeros((height, width), dtype=jnp.int8)
    return jnp.pad(
        board,
        ((0, padding), (padding, padding)),
        constant_values=jnp.int8(BEDROCK_ID),
    )


def _clamp_start(v: jnp.ndarray, limit: int, dim: int) -> jnp.ndarray:
    """Normalise a slice start exactly like ``lax.dynamic_slice`` does:
    negative starts wrap Python-style (+dim), then clamp to [0, limit]."""
    v = jnp.where(v < 0, v + dim, v)
    return jnp.clip(v, 0, limit)


def _one_hot_window(start: jnp.ndarray, size: int, dim: int) -> jnp.ndarray:
    """``[dim, size]`` one-hot: out[r, i] = (r == clamp(start) + i).

    The branch-free equivalent of addressing a ``size``-window at a dynamic
    offset — contracted against a piece matrix it replaces dynamic
    slice/update-slice (gathers/scatters, which serialise badly on TPU) with
    broadcast compares + tiny matmuls.
    """
    s = _clamp_start(start, dim - size, dim)
    return (
        jnp.arange(dim, dtype=jnp.int32)[:, None]
        == s + jnp.arange(size, dtype=jnp.int32)[None, :]
    )


def collision(board: jnp.ndarray, piece: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """True iff any filled piece cell overlaps a non-empty board cell.

    Ref parity: functional/core.py:86-100 — equivalent to a 4x4
    ``dynamic_slice`` at (y, x) (with start clamping) followed by an
    overlap-any, computed gather-free: one-hot window masks contracted
    against the occupancy image.
    """
    H, W = board.shape
    ph, pw = piece.shape
    row_oh = _one_hot_window(y, ph, H).astype(jnp.int32)  # [H, ph]
    col_oh = _one_hot_window(x, pw, W).astype(jnp.int32)  # [W, pw]
    occ = (board > 0).astype(jnp.int32)
    # window[i, j] = occ[y+i, x+j]
    window = jnp.einsum("hi,hw,wj->ij", row_oh, occ, col_oh)
    return jnp.any((window > 0) & (piece > 0))


def project(
    board: jnp.ndarray,
    piece: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    cell_id: jnp.ndarray,
) -> jnp.ndarray:
    """Stamp ``piece * cell_id`` onto the board at (x, y) by addition.

    Ref parity: functional/core.py:103-121 (``dynamic_update_slice`` of an
    all-zeros board, added to the input — an overlapping projection would
    *add*, exactly as the reference does), including DUS start clamping.

    TPU note: written as one-hot row/col masks contracted against the piece
    instead of a ``dynamic_update_slice`` — a vmapped DUS with per-env offsets
    lowers to a scatter, which is ~16x slower on TPU than this branch-free
    broadcast (measured: 0.22M vs 3.5M env-iters/s at B=4096).
    """
    H, W = board.shape
    ph, pw = piece.shape
    yc = _clamp_start(y, H - ph, H)
    xc = _clamp_start(x, W - pw, W)
    row_oh = jnp.arange(H, dtype=jnp.int32)[:, None] == yc + jnp.arange(
        ph, dtype=jnp.int32
    )[None, :]  # [H, ph]
    col_oh = jnp.arange(W, dtype=jnp.int32)[None, :] == xc + jnp.arange(
        pw, dtype=jnp.int32
    )[:, None]  # [pw, W]
    stamp = (piece * cell_id).astype(jnp.int32)  # [ph, pw]
    inner = jnp.einsum(
        "ij,jw->iw", stamp, col_oh.astype(jnp.int32)
    )  # [ph, W]
    add = jnp.einsum("hi,iw->hw", row_oh.astype(jnp.int32), inner)  # [H, W]
    return board + add.astype(board.dtype)


def drop_distance(
    board: jnp.ndarray, piece: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Closed-form hard-drop distance: how far the piece falls from (x, y).

    Replaces the reference's ``lax.while_loop`` (ref: functional/core.py:243-249)
    with a branch-free first-collision computation so a vmapped batch never
    serialises: we evaluate the collision predicate at every candidate offset
    ``d`` in one gather and count the collision-free prefix.

    The predicate reproduces ``dynamic_slice`` start-clamping bit-exactly, so
    ``y + drop_distance(...)`` equals the reference's post-loop ``y`` for every
    board (including degenerate boards without a bedrock floor, where the
    reference loop would never terminate — here the drop is capped at H).

    Gather-free: the collision predicate at every candidate offset is one
    one-hot contraction (no strided window gathers, which serialise on TPU).
    """
    H, W = board.shape
    ph, pw = piece.shape
    col_oh = _one_hot_window(x, pw, W).astype(jnp.int32)  # [W, pw]
    occ = (board > 0).astype(jnp.int32)
    # overlap-per-row against the piece's columns at this x:
    # row_hit[r, i] = any_j occ[r, x+j] & piece[i, j]
    row_hit = jnp.einsum("hw,wj,ij->hi", occ, col_oh, (piece > 0).astype(jnp.int32))

    d = jnp.arange(H, dtype=jnp.int32)  # candidate offsets for y+1+d
    ys = jnp.clip(y + 1 + d, 0, H - ph)  # [H] clamped window starts
    # row one-hot per offset: oh[d, r, i] = (r == ys[d] + i)
    oh = (
        jnp.arange(H, dtype=jnp.int32)[None, :, None]
        == ys[:, None, None] + jnp.arange(ph, dtype=jnp.int32)[None, None, :]
    )
    hit = jnp.einsum("dri,ri->d", oh.astype(jnp.int32), row_hit) > 0  # [H]
    # Number of consecutive leading non-collisions == while-loop iterations.
    free_prefix = jnp.cumprod(1 - hit.astype(jnp.int32))
    return jnp.sum(free_prefix)


def hard_drop(
    board: jnp.ndarray, piece: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop to rest; returns (new_y, reward = 2 per cell dropped).

    Ref parity: functional/core.py:230-251.
    """
    dist = drop_distance(board, piece, x, y)
    return y + dist, 2 * dist


def clear_lines(
    board: jnp.ndarray, height: int, width: int, padding: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clear filled rows and compact the stack downward; branch-free.

    Uses the sort-compaction pattern (already TPU-ideal, kept from the
    reference design, ref: functional/core.py:185-227): filled row indices are
    sent to ``-height`` so an ascending sort moves them to the top, then a
    ``take`` with fill 0 rebuilds the playfield with cleared rows as fresh
    zeros.  Unlike the reference there is no ``lax.cond`` wrapper — the
    no-rows-filled case is the identity of the same computation, so running
    it unconditionally is bit-exact and cheaper under vmap.
    """
    inner = board[:-padding, padding:-padding]  # [height, width] playfield
    filled = jnp.all(inner > 0, axis=1)  # [height]
    n = jnp.sum(filled.astype(jnp.int32))

    # Row-permutation as a one-hot matrix instead of sort+take (vmapped sorts
    # and row gathers serialise on TPU): unfilled row s lands at destination
    # rank(s) + n (rank = index among unfilled rows); cleared rows fall out as
    # all-zero destination rows for free.
    keep = (~filled).astype(jnp.int32)
    dest = jnp.cumsum(keep) - 1 + n  # [height] destination row of each source
    perm = (
        jnp.arange(height, dtype=jnp.int32)[:, None] == dest[None, :]
    ).astype(jnp.int32) * keep[None, :]  # [dest, src]
    compacted = jnp.einsum("ds,sw->dw", perm, inner.astype(jnp.int32)).astype(
        board.dtype
    )
    new_board = jnp.pad(
        compacted,
        ((0, padding), (padding, padding)),
        constant_values=jnp.int8(BEDROCK_ID),
    )
    return new_board, n


def clear_lines_compat(
    board: jnp.ndarray, height: int, width: int, padding: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Line clear with the *reference functional engine's* exact semantics.

    The reference compacts with ``jnp.take(sub_board, sorted_indices, axis=0,
    fill_value=0)`` where cleared rows get index ``-height``
    (ref: functional/core.py:202-215).  ``jnp.take``'s fill mode wraps
    negative indices before bounds-checking, so ``-height`` resolves to row
    0 of the *pre-clear* board: the new top rows are copies of the old top
    row, not zeros.  In practice the top row is almost always empty, but
    when the stack reaches row 0 and a line clears in the same lock the
    reference duplicates that row — a quirk this variant reproduces for
    bit-exact parity.  The flagship engine uses :func:`clear_lines` (true
    zeros, the OOP reference's behaviour, ref: envs/tetris.py:481-512).
    """
    inner = board[:-padding, padding:-padding]
    filled = jnp.all(inner > 0, axis=1)
    n = jnp.sum(filled.astype(jnp.int32))

    keep = (~filled).astype(jnp.int32)
    dest = jnp.cumsum(keep) - 1 + n
    perm = (
        jnp.arange(height, dtype=jnp.int32)[:, None] == dest[None, :]
    ).astype(jnp.int32) * keep[None, :]
    compacted = jnp.einsum("ds,sw->dw", perm, inner.astype(jnp.int32)).astype(
        board.dtype
    )
    # reference quirk: "cleared" destination rows wrap to pre-clear row 0
    top = jnp.arange(height, dtype=jnp.int32)[:, None] < n
    compacted = jnp.where(top, inner[0][None, :], compacted)
    new_board = jnp.pad(
        compacted,
        ((0, padding), (padding, padding)),
        constant_values=jnp.int8(BEDROCK_ID),
    )
    return new_board, n


def score_fn(rows_cleared: jnp.ndarray) -> jnp.ndarray:
    """Functional-engine line-clear score: 1->100, 2->300, 3->500, 4->800.

    Ref parity: functional/core.py:124-146 (``rows*200 - 100`` for 1..3,
    800 for a tetris, 0 otherwise) — expressed branch-free.
    """
    rows = rows_cleared.astype(jnp.int32)
    standard = jnp.where(rows > 0, rows * 200 - 100, 0)
    return jnp.where(rows == 4, 800, standard)


def score_classic(rows_cleared: jnp.ndarray, width: int) -> jnp.ndarray:
    """OOP-engine scoring: ``(rows ** 2) * width`` (ref: envs/tetris.py:621-630)."""
    rows = rows_cleared.astype(jnp.int32)
    return rows * rows * width


def gravity_step(
    board: jnp.ndarray, piece: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """One cell of gravity if the cell below is free (ref: functional/core.py:150-182)."""
    blocked = collision(board, piece, x, y + 1)
    return jnp.where(blocked, y, y + 1)


def spawn_xy_fn(config: EnvConfig) -> Tuple[int, int]:
    """Compat-engine spawn position.

    The reference derives x from the *padded* matrix width, which is always 4,
    so the spawn column is piece-independent (ref: functional/core.py:66-83).
    """
    return (config.width + 2 * config.padding) // 2 - MAX_SIZE // 2, 0


def spawn_x_classic(padded_width: int, box: jnp.ndarray) -> jnp.ndarray:
    """OOP-engine spawn column: centred on the piece's (square) bounding box.

    Ref parity: envs/tetris.py:536-541 (uses ``matrix.shape[0] // 2`` of the
    unpadded matrix — the box side, since all piece matrices are square).
    """
    return padded_width // 2 - box // 2
