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


def _clamp_start(v: jnp.ndarray, limit: int) -> jnp.ndarray:
    """Clamp a slice start like ``lax.dynamic_slice`` does (0 <= v <= limit)."""
    return jnp.clip(v, 0, limit)


def collision(board: jnp.ndarray, piece: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """True iff any filled piece cell overlaps a non-empty board cell.

    Ref parity: functional/core.py:86-100 — a 4x4 ``dynamic_slice`` at (y, x)
    (with start clamping) followed by an overlap-any.
    """
    h, w = piece.shape
    section = jax.lax.dynamic_slice(board, (y, x), (h, w))
    return jnp.any((section > 0) & (piece > 0))


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
    *add*, exactly as the reference does).
    """
    stamp = (piece * cell_id).astype(board.dtype)
    zeros = jnp.zeros_like(board)
    update = jax.lax.dynamic_update_slice(zeros, stamp, (y, x))
    return board + update


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
    """
    H, W = board.shape
    ph, pw = piece.shape
    xs = _clamp_start(x, W - pw)
    strip = jax.lax.dynamic_slice(board, (jnp.int32(0), xs), (H, pw))  # [H, pw]

    d = jnp.arange(H, dtype=jnp.int32)  # candidate offsets for y+1+d
    ys = jnp.clip(y + 1 + d, 0, H - ph)  # [H] clamped window starts
    rows = ys[:, None] + jnp.arange(ph, dtype=jnp.int32)[None, :]  # [H, ph]
    windows = strip[rows]  # [H, ph, pw] gather of row-windows
    hit = jnp.any((windows > 0) & (piece > 0)[None], axis=(1, 2))  # [H]
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

    order = jnp.where(filled, -height, jnp.arange(height))
    order = jnp.sort(order)
    compacted = jnp.take(inner, order, axis=0, fill_value=0)
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
