"""Unit tests for the pluggable component layer.

Mirrors the reference's component tests (ref: tests/test_components/):
bag completeness + seed determinism, queue FIFO/constant-size, holder swap
semantics and copy independence — plus the TPU-specific bridges: the pure
draw-function registry and custom piece-set compilation.
"""
import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.components import (
    BagRandomizer,
    Pixel,
    Tetromino,
    TetrominoHolder,
    TetrominoQueue,
    TrueRandomizer,
    bag_draw,
    default_tetrominoes,
    get_draw_fn,
    pieces_from_tetrominoes,
    register_randomizer,
    uniform_draw,
)
from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.pieces import PIECES


class TestRandomizers:
    def test_bag_completeness(self):
        """Every piece appears exactly once per bag of 7."""
        r = BagRandomizer(7)
        r.reset(seed=42)
        for _ in range(5):
            bag = sorted(r.get_next_tetromino() for _ in range(7))
            assert bag == list(range(7))

    def test_bag_seed_determinism(self):
        a, b = BagRandomizer(7), BagRandomizer(7)
        a.reset(seed=123)
        b.reset(seed=123)
        assert [a.get_next_tetromino() for _ in range(50)] == [
            b.get_next_tetromino() for _ in range(50)
        ]

    def test_seed_only_honored_first_reset(self):
        """Gymnasium seeding pattern: later unseeded resets don't re-key
        (ref: components/tetromino_randomizer.py:34-46)."""
        a, b = BagRandomizer(7), BagRandomizer(7)
        a.reset(seed=7)
        b.reset(seed=7)
        a.get_next_tetromino()
        a.reset()  # reshuffles with the *advanced* rng, not a fresh seed
        b.get_next_tetromino()
        b.reset()
        assert [a.get_next_tetromino() for _ in range(14)] == [
            b.get_next_tetromino() for _ in range(14)
        ]

    def test_true_randomizer_range(self):
        r = TrueRandomizer(7)
        r.reset(seed=1)
        draws = {r.get_next_tetromino() for _ in range(500)}
        assert draws == set(range(7))  # full range 0..6, no off-by-one

    def test_copy_independence(self):
        r = BagRandomizer(7)
        r.reset(seed=9)
        r2 = copy.copy(r)
        seq = [r.get_next_tetromino() for _ in range(21)]
        seq2 = [r2.get_next_tetromino() for _ in range(21)]
        assert seq == seq2


class TestQueue:
    def test_fifo_and_constant_size(self):
        r = BagRandomizer(7)
        q = TetrominoQueue(r, size=4)
        q.reset(seed=5)
        head = q.get_queue()[0]
        assert q.get_next_tetromino() == head
        assert len(q.get_queue()) == 4

    def test_queue_matches_randomizer_stream(self):
        r1, r2 = BagRandomizer(7), BagRandomizer(7)
        q = TetrominoQueue(r1, size=4)
        q.reset(seed=11)
        r2.reset(seed=11)
        stream = [r2.get_next_tetromino() for _ in range(20)]
        got = [q.get_next_tetromino() for _ in range(16)]
        assert got == stream[:16]


class TestHolder:
    def test_swap_returns_none_until_full(self):
        h = TetrominoHolder(size=2)
        assert h.swap("a") is None
        assert h.swap("b") is None
        assert h.swap("c") == "a"
        assert h.get_tetrominoes() == ["b", "c"]

    def test_reset_and_copy(self):
        h = TetrominoHolder(size=1)
        h.swap("x")
        h2 = copy.copy(h)
        h.reset()
        assert h.get_tetrominoes() == []
        assert h2.get_tetrominoes() == ["x"]


class TestDrawRegistry:
    def test_builtin_kinds_resolve(self):
        assert get_draw_fn("bag") is bag_draw
        assert get_draw_fn("uniform") is uniform_draw
        with pytest.raises(KeyError):
            get_draw_fn("nope")

    def test_bag_draw_completeness_on_device(self):
        key = jax.random.PRNGKey(0)
        bag = jax.random.permutation(key, jnp.arange(7))
        idx = jnp.int32(0)
        seen = []
        for _ in range(14):
            p, bag, idx, key = bag_draw(bag, idx, key)
            seen.append(int(p))
        assert sorted(seen[:7]) == list(range(7))
        assert sorted(seen[7:]) == list(range(7))

    def test_custom_randomizer_registration(self):
        """A registered pure strategy is selectable via queue_kind."""

        def always_o(bag, bag_index, key):
            return jnp.int32(1), bag, bag_index, key  # piece 1 = O

        from tetris_gymnasium_tpu.components.tetromino_randomizer import (
            unregister_randomizer,
        )

        register_randomizer("always_o", always_o)
        try:
            config = EngineConfig(queue_kind="always_o", queue_size=2)
            state = engine.init_state(jax.random.PRNGKey(0), config)
            assert int(state.piece) == 1
            assert np.all(np.asarray(state.queue) == 1)
        finally:
            unregister_randomizer("always_o")


class TestCustomPieces:
    def test_default_roundtrip(self):
        """Compiling the default Tetromino list reproduces PIECES exactly."""
        pieces, padding = pieces_from_tetrominoes(default_tetrominoes())
        assert padding == 4
        np.testing.assert_array_equal(pieces.ids, PIECES.ids)
        np.testing.assert_array_equal(pieces.matrices, PIECES.matrices)
        np.testing.assert_array_equal(pieces.colors, PIECES.colors)
        np.testing.assert_array_equal(pieces.box, PIECES.box)

    def test_custom_set_compiles_and_plays(self):
        """A 2-piece custom set runs through the engine end to end."""
        dot = Tetromino(0, [255, 0, 0], np.array([[1]]))
        duo = Tetromino(1, [0, 255, 0], np.array([[1, 1]]))
        pieces, padding = pieces_from_tetrominoes([dot, duo])
        assert padding == 2
        assert pieces.matrices.shape == (2, 4, 2, 2)

        config = EngineConfig(
            width=6, height=8, padding=padding, queue_size=2, queue_kind="uniform"
        )
        state = engine.init_state(jax.random.PRNGKey(3), config, pieces=pieces)
        for action in [5, 5, 5, 0, 5]:  # a few hard drops
            state, obs, r, d, info = engine.step(
                state, jnp.int32(action), config, pieces=pieces
            )
        assert int(state.steps) > 0
        board = np.asarray(state.board)
        assert board.max() <= 3  # ids 2..3 only

    def test_rectangular_matrix_padded_square(self):
        t = Tetromino(0, [1, 2, 3], np.array([[1, 1, 1]]))
        pieces, padding = pieces_from_tetrominoes([t])
        assert padding == 3
        assert pieces.matrices.shape == (1, 4, 3, 3)
        # rotation by 90 degrees moves the bar into a column
        assert pieces.matrices[0, 1].sum() == 3


class TestShellInjection:
    def test_injected_components_configure_engine(self):
        from tetris_gymnasium_tpu.envs.gym_env import Tetris

        env = Tetris(
            queue=TetrominoQueue(TrueRandomizer(7), size=6),
            holder=TetrominoHolder(size=2),
        )
        assert env.config.queue_size == 6
        assert env.config.holder_size == 2
        assert env.config.queue_kind == "uniform"
        obs, _ = env.reset(seed=0)
        assert obs["queue"].shape == (4, 4 * 6)
        assert obs["holder"].shape == (4, 4 * 2)

    def test_custom_tetrominoes_in_shell(self):
        from tetris_gymnasium_tpu.envs.gym_env import Tetris

        big = Tetromino(0, [10, 20, 30], np.ones((2, 2), dtype=np.uint8))
        env = Tetris(width=8, height=10, tetrominoes=[big], randomizer="uniform")
        assert env.config.padding == 2
        obs, _ = env.reset(seed=1)
        assert obs["board"].shape == (12, 12)
        obs, r, term, trunc, info = env.step(5)  # hard drop
        assert obs["board"].max() == 2  # single piece id


def test_flagship_plays_oversize_custom_piece_set():
    """Piece boxes beyond turbo's 5x5 packed-table limit (its documented
    guard routes them here) play full games on the flagship engine — on the
    default geometry AND on a wide (multi-word) board.  The reference
    accepts arbitrary custom Tetromino matrices (ref: envs/tetris.py:110-134)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tetris_gymnasium_tpu.components.tetromino import (
        Tetromino,
        pieces_from_tetrominoes,
    )
    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.core import engine

    tets = [
        Tetromino(2, (255, 0, 0), np.array([[1, 1], [1, 1]], np.uint8)),
        Tetromino(3, (0, 255, 0), np.ones((1, 6), np.uint8)),  # 6-wide I
        Tetromino(4, (0, 0, 255), np.array([[0, 1, 0], [1, 1, 1], [0, 0, 0]], np.uint8)),
    ]
    pieces, pad = pieces_from_tetrominoes(tets)
    assert int(pieces.box.max()) == 6  # beyond turbo's packing envelope

    rng = np.random.default_rng(0)
    for width in (10, 30):  # single-word padded=22, multi-word padded=42
        cfg = EngineConfig(
            width=width, height=16, padding=pad, queue_size=2,
            auto_reset=False, queue_kind="uniform",
        )
        state, obs = engine.reset(
            jax.random.PRNGKey(0), cfg, pieces=pieces, obs_fn=engine.observe_board
        )
        step = jax.jit(functools.partial(
            engine.step, config=cfg, pieces=pieces, obs_fn=engine.observe_board
        ))
        steps = 0
        while not bool(state.game_over) and steps < 2000:
            state, obs, r, d, info = step(state, jnp.int32(rng.integers(0, 8)))
            steps += 1
        assert bool(state.game_over) and steps > 5, f"width {width}"
        assert obs.shape == (16, width)


def test_turbo_plays_oversize_custom_piece_set():
    """Turbo == flagship, field for field, on a 6x6-box custom piece set —
    the multi-word piece-table packing (round-4 review missing #3 closed):
    piece row masks straddle uint32 boundaries in the packed table and
    unpack with static split shifts.  Narrow (single-word rows) AND wide
    (multi-word rows) boards."""
    import functools

    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.components.tetromino import pieces_from_tetrominoes
    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.core import engine, turbo
    from tetris_gymnasium_tpu.parallel.mesh import batch_keys

    tets = [
        Tetromino(2, (255, 0, 0), np.array([[1, 1], [1, 1]], np.uint8)),
        Tetromino(3, (0, 255, 0), np.ones((1, 6), np.uint8)),  # 6-wide I
        Tetromino(4, (0, 0, 255), np.array([[0, 1, 0], [1, 1, 1], [0, 0, 0]], np.uint8)),
    ]
    pieces, pad = pieces_from_tetrominoes(tets)
    assert int(pieces.box.max()) == 6  # beyond the old one-word envelope
    assert turbo._tables_for(pieces).n_words == 2  # 36 bits -> two words

    rng = np.random.default_rng(1)
    B, T = 8, 150
    for width in (10, 40):
        cfg = EngineConfig(
            width=width, height=14, padding=pad, queue_size=2,
            auto_reset=True, queue_kind="uniform",
        )
        keys = batch_keys(jax.random.PRNGKey(4), B)
        es = jax.jit(jax.vmap(functools.partial(
            engine.init_state, config=cfg, pieces=pieces)))(keys)
        ts = turbo.init(keys, cfg, pieces=pieces)
        f_step = jax.jit(jax.vmap(functools.partial(
            engine.step, config=cfg, pieces=pieces, obs_fn=lambda s, c, p: ())))
        t_step = jax.jit(functools.partial(turbo.step, config=cfg, pieces=pieces))
        f_obs = jax.jit(jax.vmap(functools.partial(
            engine.observe_board, config=cfg, pieces=pieces)))
        t_obs = jax.jit(functools.partial(turbo.observe_board, config=cfg, pieces=pieces))

        deaths = 0
        for i in range(T):
            acts = jnp.asarray(rng.integers(0, 8, size=B), dtype=jnp.int32)
            es, _, er, ed, einfo = f_step(es, acts)
            ts, _, tr, td, tinfo = t_step(ts, acts)
            ctx = f"w={width} step {i}"
            np.testing.assert_array_equal(
                np.asarray(t_obs(ts)), np.asarray(f_obs(es)), err_msg=f"board {ctx}")
            np.testing.assert_allclose(
                np.asarray(tr), np.asarray(er), err_msg=f"reward {ctx}")
            np.testing.assert_array_equal(
                np.asarray(td), np.asarray(ed), err_msg=f"done {ctx}")
            for name in ("piece", "rotation", "x", "y", "game_over", "lines"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(ts, name)), np.asarray(getattr(es, name)),
                    err_msg=f"{name} {ctx}")
            deaths += int(np.asarray(ed).sum())
        assert deaths > 0, "oversize fuzz must cross auto-reset boundaries"
