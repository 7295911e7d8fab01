"""Turbo engine: batch-native, bit-packed hot path for training-scale batches.

Same game as the flagship engine (:mod:`tetris_gymnasium_tpu.core.engine` —
8 actions incl. holder/swap, preview queue over a 7-bag, gravity commits,
``(lines**2) * width`` scoring, OOP reference semantics,
ref: tetris_gymnasium/envs/tetris.py:203-272), rebuilt around the two things
that cap the flagship's batched throughput on TPU:

1. **Batch-minor layout (structure-of-arrays).**  The flagship is a per-env
   function lifted with ``vmap``, which puts the env axis *leading*: a batched
   board is ``uint32[B, 24]`` and every elementwise op fills only 24 of the
   VPU's 128 lanes (~19% utilization).  Here every state array carries the
   env batch as its **minor** axis — boards are ``uint32[H, B]``, bags
   ``int32[n, B]`` — so each op is a full-lane ``[B]``-wide vector op and
   per-env masks broadcast for free against the minor axis.

2. **No id-image maintenance.**  The board exists only as packed occupancy
   rows (one uint32 per row); the flagship's per-step id-board projection and
   ``[20,20]x[20,18]`` compaction einsums (its dominant cost, ~7k MACs per
   env-step) are gone.  Observations that need cell ids (Dict obs, RGB
   rendering) belong to the flagship/shell; the turbo obs is the binary
   board-with-active-piece view that every training workload in the reference
   actually consumes after wrapping (ref: envs/tetris_fn.py:137-158).

Trajectory equivalence: with the same per-env RNG key, turbo and flagship
play **identical** games — same pieces, positions, rewards, terminations and
board occupancy.  Both draw from the same counter-based RNG
(:mod:`tetris_gymnasium_tpu.ops.rng`) through the same shape-polymorphic
randomizer strategies, in the same order.  ``tests/test_turbo.py`` pins this
field-for-field over long random rollouts, which transitively inherits the
flagship's parity tests against the reference OOP env.

Line-clear envelope (static): compaction assumes at most ``max_clear``
(default 4) rows clear in one lock — always true for any state the engine
itself can reach, since a piece spans at most 4 rows and already-full rows
cannot exist between locks.  A hand-built board beyond the envelope is
ALWAYS handled safely: the env terminates (``game_over`` + its reward)
instead of playing on from a mis-compacted board
(tests/test_turbo.py::test_surgery_overflow_terminates_always_on); pass
``max_clear=config.height`` to actually clear >4 rows, or set
``TETRIS_TPU_DEBUG=1`` before the first jit for a loud failure.

Any board geometry is supported: padded widths beyond one uint32 word use
the multi-word kernels' layout (rows ``uint32[H, NW, B]``,
:mod:`ops.bitboard_wide` semantics), selected at trace time — the
single-word hot path is untouched.  Parity at wide geometries is pinned in
``tests/test_wide_boards.py``.
"""
from __future__ import annotations

import functools
import os
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig, RewardsMapping
from tetris_gymnasium_tpu.ops import bitboard as bb
from tetris_gymnasium_tpu.ops import bitboard_wide as bw
from tetris_gymnasium_tpu.ops import rng as orng
from tetris_gymnasium_tpu.pieces import PIECES, PieceSet
from tetris_gymnasium_tpu.utils.tree import select_tree

ACTIONS = ActionsMapping()
REWARDS = RewardsMapping()


@struct.dataclass
class TurboState:
    """Batched engine state, every field with the env batch as its MINOR axis.

    Scalar-per-env fields are ``[B]``; row-indexed fields are ``[rows, B]``.
    This is the transpose of what ``vmap`` over the flagship produces — the
    layout is the point (see module docstring).
    """

    key: jnp.ndarray  # uint32[2, B] counter-RNG state per env
    rows: jnp.ndarray  # uint32[H, B] packed occupancy (bit w = column w);
    #   boards wider than one word carry a word axis: uint32[H, NW, B]
    piece: jnp.ndarray  # int32[B]
    rotation: jnp.ndarray  # int32[B]
    x: jnp.ndarray  # int32[B]
    y: jnp.ndarray  # int32[B]
    bag: jnp.ndarray  # int32[n_pieces, B]
    bag_index: jnp.ndarray  # int32[B]
    queue: jnp.ndarray  # int32[queue_size, B]
    holder_piece: jnp.ndarray  # int32[holder_size, B]
    holder_rotation: jnp.ndarray  # int32[holder_size, B]
    holder_count: jnp.ndarray  # int32[B]
    has_swapped: jnp.ndarray  # bool[B]
    game_over: jnp.ndarray  # bool[B]
    score: jnp.ndarray  # float32[B]
    lines: jnp.ndarray  # int32[B]
    steps: jnp.ndarray  # int32[B]


class _Tables(NamedTuple):
    """Host-side constant tables closed over by the jitted step."""

    packed: np.ndarray  # uint32[n*4, NW] piece row-bits, S bits per row,
    #   packed contiguously across NW words (NW=1 for the default pieces)
    box: np.ndarray  # int32[n]
    size: int  # piece box side S (rows per piece, bits per packed row)
    n_pieces: int
    n_words: int  # NW = ceil(S*S / 32)


_TABLES_CACHE: dict = {}


def _tables_for(pieces: PieceSet) -> _Tables:
    # keyed by table content (PieceSet holds numpy arrays — not hashable);
    # only ever hit at trace time.
    ck = (pieces.matrices.tobytes(), pieces.box.tobytes())
    hit = _TABLES_CACHE.get(ck)
    if hit is not None:
        return hit
    rtab = bb.row_bits_table(pieces)  # uint32 [n, 4, S]
    n, _, size = rtab.shape
    if size > 32:
        raise NotImplementedError(
            f"piece box side {size} exceeds one 32-bit row mask; no Tetris "
            "variant needs pieces wider than 32 columns"
        )
    # Pack the S rows (S bits each) contiguously across ceil(S*S/32) words.
    # The default 4x4 set fits one word (the round-3 single-word layout,
    # byte-identical here); oversize custom sets — the reference accepts any
    # Tetromino matrix (ref: envs/tetris.py:110-134) — straddle word
    # boundaries with static split shifts, the ops/bitboard_wide.py recipe.
    n_words = (size * size + 31) // 32
    flat = rtab.reshape(n * 4, size).astype(np.uint64)
    packed = np.zeros((n * 4, n_words), dtype=np.uint64)
    for s in range(size):
        w0, r = divmod(s * size, 32)
        packed[:, w0] |= (flat[:, s] << np.uint64(r)) & np.uint64(0xFFFFFFFF)
        if r + size > 32:
            packed[:, w0 + 1] |= flat[:, s] >> np.uint64(32 - r)
    t = _Tables(
        packed=packed.astype(np.uint32),  # [n*4, NW]
        box=np.asarray(pieces.box, dtype=np.int32),
        size=size,
        n_pieces=n,
        n_words=n_words,
    )
    _TABLES_CACHE[ck] = t
    return t


# ---------------------------------------------------------------------------
# Bit kernels in [H, B] layout
# ---------------------------------------------------------------------------


def _clamp_start(v: jnp.ndarray, limit: int, dim: int) -> jnp.ndarray:
    """dynamic_slice start normalisation (parity with ops.bitboard)."""
    v = jnp.where(v < 0, v + dim, v)
    return jnp.clip(v, 0, limit)


def _row_bits(t: _Tables, piece: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """Piece row masks ``uint32[S, B]`` for per-env (piece, rotation).

    One packed-uint32 select over the ``n*4``-entry constant table (28 for
    the default set), then static unpack shifts — ~36 full-lane ops versus
    the flagship's 112 (it selects each of the 4 rows separately).
    """
    idx = piece * 4 + rotation  # [B]
    words = []
    for w in range(t.n_words):
        pw = jnp.zeros_like(idx, dtype=jnp.uint32)
        for k in range(t.packed.shape[0]):
            pw = jnp.where(idx == k, jnp.uint32(t.packed[k, w]), pw)
        words.append(pw)
    return _unpack_rows(t, words)  # [S, B]


def _unpack_rows(t: _Tables, words) -> jnp.ndarray:
    """Static unpack shifts: row ``s`` occupies bits [s*S, (s+1)*S) of the
    packed words; straddling rows combine two words with guarded shifts."""
    mask = jnp.uint32((1 << t.size) - 1) if t.size < 32 else jnp.uint32(0xFFFFFFFF)
    rows = []
    for s in range(t.size):
        w0, r = divmod(s * t.size, 32)
        v = words[w0] >> jnp.uint32(r)
        if r and r + t.size > 32:
            v = v | (words[w0 + 1] << jnp.uint32(32 - r))
        rows.append(v & mask)
    return jnp.stack(rows)


def _row_bits_spawn(t: _Tables, piece: jnp.ndarray) -> jnp.ndarray:
    """Row masks at rotation 0 only (spawn collision check): n selects."""
    words = []
    for w in range(t.n_words):
        pw = jnp.zeros_like(piece, dtype=jnp.uint32)
        for p in range(t.n_pieces):
            pw = jnp.where(piece == p, jnp.uint32(t.packed[p * 4, w]), pw)
        words.append(pw)
    return _unpack_rows(t, words)


def _shift(rb: jnp.ndarray, x: jnp.ndarray, width: int) -> jnp.ndarray:
    """x-shifted piece rows (dynamic_slice start clamping).

    ``width <= 32``: ``uint32[S, *batch]`` single words (the hot path,
    unchanged).  Wider boards: ``uint32[S, NW, *batch]`` — each piece row
    splits into a low word ``rb << (x % 32)`` at word ``x // 32`` and a
    guarded carry ``rb >> (32 - x % 32)`` at the next word (a shift by 32
    would be undefined; the carry is zero then anyway).
    """
    xc = _clamp_start(x, width - rb.shape[0], width)
    if width <= 32:
        return rb << xc.astype(jnp.uint32)
    nw = (width + 31) // 32
    word = (xc // 32).astype(jnp.int32)  # [*batch]
    off = (xc % 32).astype(jnp.uint32)
    lo = rb << off  # [S, *batch]
    hi = jnp.where(off == 0, jnp.uint32(0), rb >> (jnp.uint32(32) - off))
    j = jnp.arange(nw, dtype=jnp.int32).reshape((1, nw) + (1,) * xc.ndim)
    return jnp.where(j == word, lo[:, None], jnp.uint32(0)) | jnp.where(
        j == word + 1, hi[:, None], jnp.uint32(0)
    )


def _h_iota(H: int, ndim: int) -> jnp.ndarray:
    """``arange(H)`` shaped to broadcast over ``ndim - 1`` trailing batch dims."""
    return jnp.arange(H, dtype=jnp.int32).reshape((H,) + (1,) * (ndim - 1))


def _hit_map(rows: jnp.ndarray, sp: jnp.ndarray) -> jnp.ndarray:
    """``bool[H, *batch]``: piece-overlap flag at every vertical offset.

    ``hm[y] = any_s rows[y+s] & sp[s]`` — S static row shifts, pure
    elementwise full-lane work (same construction as ops.bitboard.hit_map).
    All kernels here are polymorphic over trailing batch dims: the engine
    steps ``[H, B]`` states, the grouped engine ``[H, A, B]`` candidates.
    """
    H = rows.shape[0]
    acc = rows & sp[0]
    for s in range(1, sp.shape[0]):
        shifted = jnp.concatenate(
            [rows[s:], jnp.zeros((s,) + rows.shape[1:], dtype=jnp.uint32)], axis=0
        )
        acc = acc | (shifted & sp[s])
    return acc != 0


def _hit_map_r(rows: jnp.ndarray, sp: jnp.ndarray, width: int) -> jnp.ndarray:
    """Hit map with the word axis OR-reduced away (identity when one word).

    Multi-word rows ``[H, NW, *batch]`` produce per-word overlap flags; the
    consumers (``_collision_at`` / ``_drop_from_map``) are word-free, so the
    reduction happens here.  ``width`` is the static padded width.
    """
    hm = _hit_map(rows, sp)
    return hm if width <= 32 else jnp.any(hm, axis=1)


def _spawn_overlap(rows: jnp.ndarray, sp: jnp.ndarray, width: int) -> jnp.ndarray:
    """``bool[*batch]`` overlap of spawn-shifted piece rows with rows 0..S-1."""
    over = None
    for s in range(sp.shape[0]):
        hit = rows[s] & sp[s]
        h = (hit != 0) if width <= 32 else jnp.any(hit != 0, axis=0)
        over = h if over is None else over | h
    return over


def _collision_at(hm: jnp.ndarray, y: jnp.ndarray, size: int) -> jnp.ndarray:
    """``bool[*batch]``: overlap at window start y (clamped), from a hit map."""
    H = hm.shape[0]
    yc = _clamp_start(y, H - size, H)
    return jnp.any(hm & (_h_iota(H, hm.ndim) == yc), axis=0)


def _drop_from_map(hm: jnp.ndarray, y: jnp.ndarray, size: int) -> jnp.ndarray:
    """``int32[*batch]`` hard-drop distance (parity with ops.bitboard.drop_from_map)."""
    H = hm.shape[0]
    h = _h_iota(H, hm.ndim)
    z = jnp.clip(y + 1, 0, H - size)  # [*batch]
    eligible = hm & (h >= z) & (h <= H - size)
    first_hit = jnp.min(jnp.where(eligible, h, jnp.int32(2 * H)), axis=0)
    dist = jnp.clip(first_hit - (y + 1), 0, H)
    return jnp.where(first_hit == 0, 0, dist)


def _project(rows: jnp.ndarray, sp: jnp.ndarray, y: jnp.ndarray, size: int) -> jnp.ndarray:
    """OR the x-shifted piece rows into the board at (clamped) row y."""
    H = rows.shape[0]
    yc = _clamp_start(y, H - size, H)
    h = _h_iota(H, rows.ndim)
    out = rows
    for s in range(sp.shape[0]):
        out = out | jnp.where(h == yc + s, sp[s], jnp.uint32(0))
    return out


def _envelope_debug(n: jnp.ndarray, config: EngineConfig, max_clear: int) -> None:
    """Opt-in loud failure when the compaction envelope is exceeded.

    Engine-reachable states always satisfy ``n <= 4`` (a piece spans <= 4
    rows and full rows cannot persist between locks); a hand-built board can
    exceed it.  The ALWAYS-ON mitigation lives in the callers (`_commit`
    marks the env ``game_over``, the grouped engine marks the candidate a
    game-over placement), so surgery can never silently corrupt a live
    trajectory; with ``TETRIS_TPU_DEBUG=1`` the violation additionally
    raises.  NOTE: the flag is captured at TRACE time (a per-step host
    callback is too expensive to install unconditionally on this hot path)
    — set it before the first jit of the process.
    """
    if max_clear < config.height and os.environ.get("TETRIS_TPU_DEBUG"):
        def _check_envelope(over):
            if over:
                raise ValueError(
                    f"turbo _clear_lines: more than max_clear={max_clear} "
                    "simultaneously-full rows — hand-built board? pass "
                    "max_clear=config.height or use the flagship engine"
                )

        jax.debug.callback(_check_envelope, jnp.any(n > max_clear))


def _clear_lines_wide(
    rows: jnp.ndarray, config: EngineConfig, max_clear: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-word `_clear_lines`: rows ``uint32[H, NW, *batch]``.

    Identical static-shift compaction; the playfield/side masks become
    per-word constants and the filled test AND-reduces across words.
    """
    height = config.height
    nw = (config.padded_width + 31) // 32
    batch = rows.shape[2:]
    shape1 = (1, nw) + (1,) * len(batch)
    pm = jnp.asarray(bw.play_mask_words(config.width, config.padding)).reshape(shape1)
    side = jnp.asarray(bw.side_mask_words(config.width, config.padding)).reshape(shape1)

    inner = rows[:height]  # [height, NW, *batch]
    filled = jnp.all((inner & pm) == pm, axis=1)  # [height, *batch]
    n = jnp.sum(filled.astype(jnp.int32), axis=0)
    _envelope_debug(n, config, max_clear)

    below_incl = jnp.cumsum(filled[::-1].astype(jnp.int32), axis=0)[::-1]
    sh = below_incl - filled.astype(jnp.int32)
    keep = ~filled

    acc = jnp.broadcast_to(side, (height, nw) + batch)
    for k in range(min(max_clear, height) + 1):
        move_k = keep & (sh == k)
        if k:
            pad_m = jnp.zeros((k,) + batch, dtype=jnp.bool_)
            pad_r = jnp.broadcast_to(side, (k, nw) + batch)
            move_k = jnp.concatenate([pad_m, move_k[: height - k]], axis=0)
            src = jnp.concatenate([pad_r, inner[: height - k]], axis=0)
        else:
            src = inner
        acc = jnp.where(move_k[:, None], src, acc)  # word axis broadcasts
    return jnp.concatenate([acc, rows[height:]], axis=0), n


def _clear_lines(
    rows: jnp.ndarray, config: EngineConfig, max_clear: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clear filled playfield rows, compact down; returns (rows', n_cleared).

    Compaction trick for the batch-minor layout: a kept row at index ``h``
    moves down by ``sh[h]`` = number of filled rows strictly below it, and
    ``sh[h] <= n <= max_clear``, so the permutation decomposes into
    ``max_clear + 1`` *static* downward shifts selected per row — no
    per-env permutation matrix (the flagship's ``[20, 20]`` one-hot matvec)
    and no sort.
    """
    if config.padded_width > 32:
        return _clear_lines_wide(rows, config, max_clear)
    height = config.height
    batch = rows.shape[1:]
    pm = jnp.uint32(bb.play_mask(config.width, config.padding))
    side = jnp.uint32(bb.side_mask(config.width, config.padding))

    inner = rows[:height]
    filled = (inner & pm) == pm  # [height, *batch]
    n = jnp.sum(filled.astype(jnp.int32), axis=0)  # [*batch]
    _envelope_debug(n, config, max_clear)

    # sh[h] = filled rows strictly below h (reverse exclusive cumsum)
    below_incl = jnp.cumsum(filled[::-1].astype(jnp.int32), axis=0)[::-1]
    sh = below_incl - filled.astype(jnp.int32)  # [height, *batch]
    keep = ~filled

    acc = jnp.broadcast_to(side, (height,) + batch)
    for k in range(min(max_clear, height) + 1):
        move_k = keep & (sh == k)  # source rows that move down k
        if k:
            pad_m = jnp.zeros((k,) + batch, dtype=jnp.bool_)
            pad_r = jnp.broadcast_to(side, (k,) + batch)
            move_k = jnp.concatenate([pad_m, move_k[: height - k]], axis=0)
            src = jnp.concatenate([pad_r, inner[: height - k]], axis=0)
        else:
            src = inner
        acc = jnp.where(move_k, src, acc)
    return jnp.concatenate([acc, rows[height:]], axis=0), n


def _lookup_i32(table: np.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Select from a tiny int table with per-env indices (n selects)."""
    out = jnp.zeros_like(idx)
    for k in range(table.shape[0]):
        out = jnp.where(idx == k, jnp.int32(table[k]), out)
    return out


# ---------------------------------------------------------------------------
# Queue / reset
# ---------------------------------------------------------------------------


def _draw(config: EngineConfig):
    from tetris_gymnasium_tpu.components.tetromino_randomizer import get_draw_fn

    return get_draw_fn(config.queue_kind)


def _queue_draw(queue, bag, bag_index, key, config: EngineConfig):
    """FIFO pop + randomizer backfill, batch-minor (flagship `_queue_draw`)."""
    piece = queue[0]
    refill, bag, bag_index, key = _draw(config)(bag, bag_index, key)
    queue = jnp.concatenate([queue[1:], refill[None]], axis=0)
    return piece, queue, bag, bag_index, key


def _spawn_x(t: _Tables, config: EngineConfig, piece: jnp.ndarray) -> jnp.ndarray:
    """OOP spawn column, centred on the piece box (ref: envs/tetris.py:536-541)."""
    box = _lookup_i32(t.box, piece)
    return jnp.int32(config.padded_width // 2) - box // 2


def _init_from_key(key2b: jnp.ndarray, config: EngineConfig, pieces: PieceSet) -> TurboState:
    """Fresh episodes from per-env RNG states ``uint32[2, B]``.

    Draw-for-draw identical to the flagship ``init_state``
    (core/engine.py): one bag shuffle, then active + preview taken as static
    bag slots when the fresh bag covers them.
    """
    t = _tables_for(pieces)
    n = t.n_pieces
    B = key2b.shape[1]
    key = jnp.asarray(key2b, dtype=jnp.uint32)
    key, bag = orng.shuffle(key, n)  # [n, B]
    bag_index = jnp.zeros((B,), dtype=jnp.int32)

    if config.queue_kind == "bag" and config.queue_size + 1 <= n:
        active = bag[0]
        queue = bag[1 : 1 + config.queue_size]
        bag_index = jnp.full((B,), config.queue_size + 1, dtype=jnp.int32)
    else:
        draw = _draw(config)
        active, bag, bag_index, key = draw(bag, bag_index, key)
        qs = []
        for _ in range(config.queue_size):
            p, bag, bag_index, key = draw(bag, bag_index, key)
            qs.append(p)
        queue = jnp.stack(qs)

    H = config.padded_height
    if config.padded_width <= 32:
        empty = bb.empty_rows(config.height, config.width, config.padding)  # [H]
        rows = jnp.broadcast_to(jnp.asarray(empty)[:, None], (H, B))
    else:
        empty = bw.empty_rows(config.height, config.width, config.padding)  # [H, NW]
        rows = jnp.broadcast_to(jnp.asarray(empty)[:, :, None], (H, empty.shape[1], B))
    hs = config.holder_size
    zi = jnp.zeros((B,), dtype=jnp.int32)
    return TurboState(
        key=key,
        rows=rows,
        piece=active,
        rotation=zi,
        x=_spawn_x(t, config, active),
        y=zi,
        bag=bag,
        bag_index=bag_index,
        queue=queue,
        holder_piece=jnp.zeros((hs, B), dtype=jnp.int32),
        holder_rotation=jnp.zeros((hs, B), dtype=jnp.int32),
        holder_count=zi,
        has_swapped=jnp.zeros((B,), dtype=jnp.bool_),
        game_over=jnp.zeros((B,), dtype=jnp.bool_),
        score=jnp.zeros((B,), dtype=jnp.float32),
        lines=zi,
        steps=zi,
    )


def init(keys: jnp.ndarray, config: EngineConfig, pieces: PieceSet = PIECES) -> TurboState:
    """Fresh batch from per-env keys ``[B, 2]`` (e.g. ``mesh.batch_keys``)."""
    return _init_from_key(jnp.asarray(keys, dtype=jnp.uint32).T, config, pieces)


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------


def _swap(state: TurboState, t: _Tables, config: EngineConfig):
    """Holder swap (flagship `_swap` semantics, ref: envs/tetris.py:242-252)."""
    full = state.holder_count >= config.holder_size

    idx = jnp.clip(state.holder_count, 0, config.holder_size - 1)  # [B]
    slot = jnp.arange(config.holder_size, dtype=jnp.int32)[:, None]
    at_idx = slot == idx
    hp_store = jnp.where(at_idx, state.piece, state.holder_piece)
    hr_store = jnp.where(at_idx, state.rotation, state.holder_rotation)
    q_piece, queue2, bag2, bidx2, key2 = _queue_draw(
        state.queue, state.bag, state.bag_index, state.key, config
    )

    out_piece = state.holder_piece[0]
    out_rot = state.holder_rotation[0]
    hp_swap = jnp.concatenate([state.holder_piece[1:], state.piece[None]], axis=0)
    hr_swap = jnp.concatenate([state.holder_rotation[1:], state.rotation[None]], axis=0)

    new_piece = jnp.where(full, out_piece, q_piece)
    new_rot = jnp.where(full, out_rot, 0)
    sx = _spawn_x(t, config, new_piece)

    return state.replace(
        key=jnp.where(full, state.key, key2),
        piece=new_piece,
        rotation=new_rot,
        x=sx,
        y=jnp.zeros_like(sx),
        bag=jnp.where(full, state.bag, bag2),
        bag_index=jnp.where(full, state.bag_index, bidx2),
        queue=jnp.where(full, state.queue, queue2),
        holder_piece=jnp.where(full, hp_swap, hp_store),
        holder_rotation=jnp.where(full, hr_swap, hr_store),
        holder_count=jnp.minimum(state.holder_count + 1, config.holder_size),
        has_swapped=jnp.ones_like(state.has_swapped),
    )


def _apply_action(state: TurboState, action, t: _Tables, config: EngineConfig, pieces: PieceSet):
    """Phase 1: the action's direct effect (flagship `_apply_action`)."""
    pw = config.padded_width
    S = t.size
    rows = state.rows
    rb = _row_bits(t, state.piece, state.rotation)

    dx = jnp.where(
        action == ACTIONS.move_left, -1, jnp.where(action == ACTIONS.move_right, 1, 0)
    )
    x_cand = state.x + dx
    hm_cand = _hit_map_r(rows, _shift(rb, x_cand, pw), pw)
    x = jnp.where((dx != 0) & ~_collision_at(hm_cand, state.y, S), x_cand, state.x)
    hm_x = _hit_map_r(rows, _shift(rb, x, pw), pw)
    down = (action == ACTIONS.move_down) & ~_collision_at(hm_x, state.y + 1, S)
    y = state.y + down.astype(jnp.int32)

    rot_dir = jnp.where(
        action == ACTIONS.rotate_clockwise,
        1,
        jnp.where(action == ACTIONS.rotate_counterclockwise, -1, 0),
    )
    rot_cand = jnp.mod(state.rotation + rot_dir, 4)
    rb_cand = _row_bits(t, state.piece, rot_cand)
    hm_rot = _hit_map_r(rows, _shift(rb_cand, x, pw), pw)
    rot_ok = ~_collision_at(hm_rot, y, S)
    rotation = jnp.where((rot_dir != 0) & rot_ok, rot_cand, state.rotation)

    moved = state.replace(x=x, y=y, rotation=rotation)

    do_swap = (action == ACTIONS.swap) & ~state.has_swapped
    swapped = _swap(state, t, config)
    return select_tree(do_swap, swapped, moved)


def _commit(
    state: TurboState,
    rows: jnp.ndarray,
    hm: jnp.ndarray,
    t: _Tables,
    config: EngineConfig,
    rewards: RewardsMapping,
    max_clear: int,
):
    """Drop-lock-clear-respawn (flagship `_commit`, ref: envs/tetris.py:450-479)."""
    pw = config.padded_width
    S = t.size
    rb = _row_bits(t, state.piece, state.rotation)
    pre_over = _collision_at(hm, state.y, S)

    dist = _drop_from_map(hm, state.y, S)
    y_f = state.y + dist
    stamped = _project(rows, _shift(rb, state.x, pw), y_f, S)
    cleared_rows, lines = _clear_lines(stamped, config, max_clear)

    new_piece, queue, bag, bag_index, key = _queue_draw(
        state.queue, state.bag, state.bag_index, state.key, config
    )
    sx = _spawn_x(t, config, new_piece)
    sp_new = _shift(_row_bits_spawn(t, new_piece), sx, pw)
    # spawn collision at y=0: overlap of the first S rows only
    spawn_over = _spawn_overlap(cleared_rows, sp_new, pw)
    # Always-on envelope safety: >max_clear simultaneously-full rows can
    # only come from board surgery (see _envelope_debug); the compaction
    # above clamped at max_clear shifts, so instead of playing on from a
    # mis-compacted board the env terminates (game_over + its reward).
    spawn_over = spawn_over | (lines > max_clear)

    line_reward = (lines * lines * config.width).astype(jnp.float32)
    reward = jnp.where(
        pre_over | spawn_over,
        jnp.float32(rewards.game_over),
        line_reward + jnp.float32(rewards.alife),
    )

    placed = state.replace(
        key=key,
        rows=cleared_rows,
        piece=new_piece,
        rotation=jnp.zeros_like(new_piece),
        x=sx,
        y=jnp.zeros_like(sx),
        bag=bag,
        bag_index=bag_index,
        queue=queue,
        has_swapped=jnp.zeros_like(state.has_swapped),
        game_over=spawn_over,
        lines=state.lines + lines,
    )
    new_state = select_tree(pre_over, state.replace(game_over=jnp.ones_like(pre_over)), placed)
    out_lines = jnp.where(pre_over, 0, lines)
    return new_state, reward, out_lines


def step(
    state: TurboState,
    action: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    rewards: RewardsMapping = REWARDS,
    obs_fn: Optional[Callable] = None,
    max_clear: int = 4,
) -> Tuple[TurboState, object, jnp.ndarray, jnp.ndarray, dict]:
    """One batched step; ``action`` is ``int32[B]``.

    Control flow mirrors the flagship ``engine.step`` exactly (action effect,
    gravity sub-step, commit-on-rest or hard drop, freeze-on-game-over,
    optional on-device auto-reset); returns ``(state, obs, reward, done,
    info)`` with ``obs = None`` unless an ``obs_fn(state, config, pieces)``
    is given — training loops that only need the board call
    :func:`observe_board` on the states they keep.
    """
    t = _tables_for(pieces)
    rows = state.rows
    s1 = _apply_action(state, action, t, config, pieces)

    is_drop = action == ACTIONS.hard_drop
    rb1 = _row_bits(t, s1.piece, s1.rotation)
    hm1 = _hit_map_r(rows, _shift(rb1, s1.x, config.padded_width), config.padded_width)
    grav_free = ~_collision_at(hm1, s1.y + 1, t.size)

    if config.gravity_enabled:
        fall = ~is_drop & grav_free
        commit_now = is_drop | ~grav_free
    else:
        fall = jnp.zeros_like(is_drop)
        commit_now = is_drop

    s1 = s1.replace(y=s1.y + fall.astype(jnp.int32))
    committed, commit_reward, lines = _commit(
        s1, rows, hm1, t, config, rewards, max_clear
    )

    stepped = select_tree(commit_now, committed, s1)
    reward = jnp.where(commit_now, commit_reward, jnp.float32(0))
    lines = jnp.where(commit_now, lines, 0)
    stepped = stepped.replace(score=stepped.score + reward, steps=stepped.steps + 1)

    stepped = select_tree(state.game_over, state, stepped)
    reward = jnp.where(state.game_over, jnp.float32(0), reward)
    lines = jnp.where(state.game_over, 0, lines)

    done = stepped.game_over
    if config.auto_reset:
        fresh = _init_from_key(stepped.key, config, pieces)
        stepped = select_tree(done, fresh, stepped)

    obs = obs_fn(stepped, config, pieces) if obs_fn is not None else None
    info = {"lines_cleared": lines, "score": stepped.score, "steps": stepped.steps}
    return stepped, obs, reward, done, info


# ---------------------------------------------------------------------------
# Observations
# ---------------------------------------------------------------------------


def unpack_playfield(rows: jnp.ndarray, config: EngineConfig, dtype) -> jnp.ndarray:
    """Packed rows ``uint32[H, *batch]`` -> playfield bits
    ``dtype[*batch_reversed, H, W]`` (batch axes reversed to batch-leading).

    The layout trick shared by ``observe_board`` and the grouped boards
    mode: transpose the PACKED words first (32x less data than a per-pixel
    transpose), then broadcast-unpack along a fresh trailing W axis
    (docs/scale/training_perf.md).
    """
    H, pad, W = config.height, config.padding, config.width
    nd = rows.ndim
    if config.padded_width <= 32:
        perm = tuple(range(nd - 1, 0, -1)) + (0,)  # [H, *batch] -> [*rev(batch), H]
        words = jnp.transpose(rows[:H], perm)[..., None]
        shifts = jnp.arange(pad, pad + W, dtype=jnp.uint32)  # [W]
        return ((words >> shifts) & 1).astype(dtype)
    # multi-word rows [H, NW, *batch]: transpose packed words to
    # [*rev(batch), H, NW], unpack each word's 32 bits along a fresh axis,
    # then slice the playfield columns out of the flattened bit axis.
    nw = rows.shape[1]
    perm = tuple(range(nd - 1, 1, -1)) + (0, 1)
    words = jnp.transpose(rows[:H], perm)  # [*rev(batch), H, NW]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & 1  # [*rev(batch), H, NW, 32]
    flat = bits.reshape(bits.shape[:-2] + (nw * 32,))
    return flat[..., pad : pad + W].astype(dtype)


def _col_bits(rows: jnp.ndarray, col: int, config: EngineConfig) -> jnp.ndarray:
    """``bool[H_slice, *batch]`` occupancy of absolute padded column ``col``
    (static), word-aware: multi-word rows index word ``col // 32``."""
    if config.padded_width <= 32:
        return ((rows >> jnp.uint32(col)) & 1) != 0
    return ((rows[:, col // 32] >> jnp.uint32(col % 32)) & 1) != 0


def observe_board(state: TurboState, config: EngineConfig, pieces: PieceSet = PIECES) -> jnp.ndarray:
    """Cropped binary board with the active piece stamped as -1, ``int8[B, H, W]``.

    Value-equal to the flagship ``observe_board`` (compat obs format,
    ref: envs/tetris_fn.py:137-158).  The batch axis moves to the front here
    — the only transpose in the pipeline, at the NN boundary where [B, ...]
    is the natural layout.
    """
    t = _tables_for(pieces)
    rb = _row_bits(t, state.piece, state.rotation)
    sp = _shift(rb, state.x, config.padded_width)
    # active-piece occupancy rows (like _project onto an empty board)
    ap = _project(jnp.zeros_like(state.rows), sp, state.y, t.size)
    ap = jnp.where(state.game_over, jnp.uint32(0), ap)

    stack = unpack_playfield(state.rows, config, jnp.int8)  # [B, H, W]
    active = unpack_playfield(ap, config, jnp.int8)
    # flagship stamps by *addition* (project of -1 onto the binary board,
    # ref: envs/tetris_fn.py:137-158): overlap yields 0, not -1
    return stack - active


def heights(state: TurboState, config: EngineConfig) -> jnp.ndarray:
    """Per-column stack heights ``int32[W, B]`` straight from the bit rows.

    Feature parity with the FeatureVectorObservation column heights
    (ref: wrappers/observation.py:177-193): height of column w = H - index
    of its topmost occupied playfield cell (0 if empty).
    """
    H = config.height
    pad = config.padding
    h = jnp.arange(H, dtype=jnp.int32)[:, None]
    out = []
    for w in range(pad, pad + config.width):
        occ = _col_bits(state.rows[:H], w, config)  # [H, B]
        top = jnp.min(jnp.where(occ, h, jnp.int32(H)), axis=0)
        out.append(jnp.int32(H) - top)
    return jnp.stack(out)  # [W, B]


# ---------------------------------------------------------------------------
# Flagship interop (tests, shell escape hatch)
# ---------------------------------------------------------------------------


def from_flagship(es, config: EngineConfig) -> TurboState:
    """Convert a *batched* flagship ``EngineState`` (leading env axis) to turbo.

    The id board is reduced to occupancy (ids are not represented in turbo).
    """
    if config.padded_width <= 32:
        rows = jax.vmap(bb.pack_board)(es.board).T  # [B, H] -> [H, B]
    else:
        rows = jnp.transpose(jax.vmap(bw.pack_board)(es.board), (1, 2, 0))  # [H, NW, B]
    return TurboState(
        key=es.key.T,
        rows=rows,
        piece=es.piece,
        rotation=es.rotation,
        x=es.x,
        y=es.y,
        bag=es.bag.T,
        bag_index=es.bag_index,
        queue=es.queue.T,
        holder_piece=es.holder_piece.T,
        holder_rotation=es.holder_rotation.T,
        holder_count=es.holder_count,
        has_swapped=es.has_swapped,
        game_over=es.game_over,
        score=es.score,
        lines=es.lines,
        steps=es.steps,
    )


# ---------------------------------------------------------------------------
# Cached batched entry points
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def jit_step(config: EngineConfig, rewards: RewardsMapping = REWARDS):
    """Cached jitted batched step (no obs) for the default piece set."""
    return jax.jit(functools.partial(step, config=config, rewards=rewards))


@functools.lru_cache(maxsize=None)
def jit_init(config: EngineConfig):
    """Cached jitted batched init for the default piece set."""
    return jax.jit(functools.partial(init, config=config))


def rollout(
    state: TurboState,
    actions: jnp.ndarray,
    config: EngineConfig,
    pieces: PieceSet = PIECES,
    obs_fn: Optional[Callable] = None,
):
    """Scan an action sequence ``[T, B]`` in one XLA program."""

    def one(carry, action):
        s, o, r, d, info = step(carry, action, config, pieces, obs_fn=obs_fn)
        return s, (o, r, d, info["lines_cleared"])

    return jax.lax.scan(one, state, actions)
