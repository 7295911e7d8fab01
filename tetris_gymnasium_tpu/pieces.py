"""Tetromino piece tables, precomputed for gather-friendly TPU access.

All seven pieces, all four rotation states, pre-rotated at import time into a
single ``[7, 4, 4, 4]`` int8 tensor so that fetching a piece matrix inside a
jitted step is a single 2-level gather (no control flow, no rotation math on
device).  Values are identical to the reference tables
(ref: tetris_gymnasium/functional/tetrominoes.py:43-148 — ids 2..8, the same
shapes, colors and rotation convention ``rot_k = rot90 applied k times``).

TPU-first design notes:
  * the rotation axis is materialised (28 tiny matrices, 448 bytes total) —
    it lives in VMEM for the whole program; rotation becomes an index bump.
  * per-piece metadata that the reference recomputes from ragged matrices
    (bounding-box size, OOP spawn column) is precomputed into flat int32
    tables so the engine never needs ragged shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

# Piece shapes in their canonical (rotation 0) orientation.  Drawn as strings
# for auditability; identical cell layouts to the reference
# (ref: functional/tetrominoes.py:43-79).
_SHAPES = {
    "I": ("....", "####", "....", "...."),
    "O": ("##", "##"),
    "T": (".#.", "###", "..."),
    "S": (".##", "##.", "..."),
    "Z": ("##.", ".##", "..."),
    "J": ("#..", "###", "..."),
    "L": ("..#", "###", "..."),
}
PIECE_ORDER = ("I", "O", "T", "S", "Z", "J", "L")

# RGB colors per piece (ref: functional/tetrominoes.py:44-78).
_COLORS = {
    "I": (0, 240, 240),
    "O": (240, 240, 0),
    "T": (160, 0, 240),
    "S": (0, 240, 0),
    "Z": (240, 0, 0),
    "J": (0, 0, 240),
    "L": (240, 160, 0),
}

# Cell ids: 0 = empty, 1 = bedrock, pieces start at 2
# (ref: functional/tetrominoes.py:136-145).
EMPTY_ID = 0
BEDROCK_ID = 1
FIRST_PIECE_ID = 2
NUM_PIECES = len(PIECE_ORDER)
MAX_SIZE = 4  # all rotation matrices are padded to 4x4


def _shape_to_matrix(rows: Tuple[str, ...]) -> np.ndarray:
    return np.array([[1 if c == "#" else 0 for c in r] for r in rows], dtype=np.int8)


def _build_tables():
    mats = np.zeros((NUM_PIECES, 4, MAX_SIZE, MAX_SIZE), dtype=np.int8)
    boxes = np.zeros((NUM_PIECES,), dtype=np.int32)
    for p, name in enumerate(PIECE_ORDER):
        base = _shape_to_matrix(_SHAPES[name])
        k = base.shape[0]
        boxes[p] = k
        rot = base
        for r in range(4):
            # top-left aligned padding to 4x4; since every base matrix is
            # square (k x k), rotating-then-padding keeps the piece inside the
            # same k x k sub-box — matching the reference's precomputation
            # (ref: functional/tetrominoes.py:123-133).
            mats[p, r, :k, :k] = rot
            rot = np.rot90(rot)  # reference rotation convention (k=+1)
    return mats, boxes


_MATRICES_NP, _BOX_NP = _build_tables()


class PieceSet(NamedTuple):
    """Piece tables, held as *numpy* arrays.

    Numpy (not ``jnp``) on purpose: these are closure constants of every
    jitted step program, and XLA embeds host numpy arrays as literals for
    free, whereas a committed device array triggers a device->host read at
    lowering time (hundreds of seconds over a TPU tunnel).  Inside a trace
    they behave identically under ``jnp`` indexing/arithmetic.

    Attributes:
        ids: ``[7]`` int8 cell ids (2..8).
        colors: ``[7, 3]`` uint8 RGB colors.
        matrices: ``[7, 4, 4, 4]`` int8 — ``matrices[p, r]`` is piece ``p``
            rotated ``r`` times, as a binary mask padded to 4x4.
        box: ``[7]`` int32 bounding-box side length (I=4, O=2, rest=3); used
            for OOP-exact spawn columns and active-piece masks
            (ref: envs/tetris.py:536-541, 566-576).
        base_colors: ``[2, 3]`` uint8 colors for empty/bedrock cells.
    """

    ids: np.ndarray
    colors: np.ndarray
    matrices: np.ndarray
    box: np.ndarray
    base_colors: np.ndarray

    @property
    def palette(self) -> np.ndarray:
        """``[9, 3]`` uint8 palette indexed directly by cell id."""
        return np.concatenate([self.base_colors, self.colors], axis=0)

    def jx(self) -> "PieceSet":
        """The same tables as ``jnp`` values, for traced (tracer-index) use.

        Call at the top of a function that indexes tables with traced values
        (numpy rejects tracer indices).  Under ``jit`` this is free: the
        arrays become embedded XLA literals.
        """
        return PieceSet(*(jnp.asarray(t) for t in self))


def make_pieces() -> PieceSet:
    """Build the default 7-piece set (identical values to the reference)."""
    return PieceSet(
        ids=np.arange(FIRST_PIECE_ID, FIRST_PIECE_ID + NUM_PIECES, dtype=np.int8),
        colors=np.array([_COLORS[n] for n in PIECE_ORDER], dtype=np.uint8),
        matrices=_MATRICES_NP,
        box=_BOX_NP,
        base_colors=np.array([[0, 0, 0], [128, 128, 128]], dtype=np.uint8),
    )


PIECES = make_pieces()


def piece_matrix(pieces: PieceSet, piece: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """Fetch the ``[4, 4]`` binary matrix of ``piece`` at ``rotation``.

    Equivalent of the reference's ``get_tetromino_matrix``
    (ref: functional/tetrominoes.py:151-165).  Computed as a one-hot
    contraction against the constant table rather than a 2-level gather:
    vmapped gathers with per-env indices serialise on TPU, while the
    contraction is a tiny matmul over an embedded 448-byte literal.
    """
    mats = jnp.asarray(pieces.matrices).astype(jnp.int32)  # [n, 4, S, S]
    p_oh = (jnp.arange(mats.shape[0], dtype=jnp.int32) == piece).astype(jnp.int32)
    r_oh = (jnp.arange(4, dtype=jnp.int32) == rotation).astype(jnp.int32)
    return jnp.einsum("p,r,prij->ij", p_oh, r_oh, mats).astype(jnp.int8)
