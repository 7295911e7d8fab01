"""Turbo-engine equivalence: batch-minor bit engine vs the flagship engine.

The turbo engine must play the *identical* game as the flagship given the
same per-env RNG keys — same pieces, positions, rewards, terminations and
board occupancy — because both draw from the same counter RNG through the
same shape-polymorphic randomizer strategies in the same order.  These tests
pin that field-for-field, which transitively inherits the flagship's parity
suite against the reference OOP env (tests/test_engine_vs_oop.py).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine, turbo
from tetris_gymnasium_tpu.ops import bitboard as bb
from tetris_gymnasium_tpu.parallel.mesh import batch_keys


def _flagship_batch(keys, config):
    return jax.jit(jax.vmap(functools.partial(engine.init_state, config=config)))(keys)


def _assert_states_match(ts: turbo.TurboState, es: engine.EngineState, step_i):
    """Compare a turbo state against a batched flagship state."""
    pack = jax.vmap(bb.pack_board)
    np.testing.assert_array_equal(
        np.asarray(ts.rows), np.asarray(pack(es.board)).T, err_msg=f"rows @ {step_i}"
    )
    for name in ("piece", "rotation", "x", "y", "bag_index", "holder_count",
                 "has_swapped", "game_over", "lines", "steps"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ts, name)), np.asarray(getattr(es, name)),
            err_msg=f"{name} @ {step_i}",
        )
    for name in ("key", "bag", "queue", "holder_piece", "holder_rotation"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ts, name)), np.asarray(getattr(es, name)).T,
            err_msg=f"{name} @ {step_i}",
        )
    np.testing.assert_allclose(
        np.asarray(ts.score), np.asarray(es.score), err_msg=f"score @ {step_i}"
    )


@pytest.mark.parametrize("queue_kind", ["bag", "uniform"])
def test_init_equivalence(queue_kind):
    config = EngineConfig(queue_kind=queue_kind)
    keys = batch_keys(jax.random.PRNGKey(7), 16)
    es = _flagship_batch(keys, config)
    ts = turbo.init(keys, config)
    _assert_states_match(ts, es, "init")


@pytest.mark.parametrize(
    "config",
    [
        EngineConfig(),
        EngineConfig(auto_reset=True),
        EngineConfig(queue_kind="uniform", auto_reset=True),
        EngineConfig(gravity_enabled=False),
        EngineConfig(queue_size=7, holder_size=2),
        # nonstandard geometries: the packed-row kernels, spawn math,
        # line compaction and observation unpack must hold off the 10x20
        # default (padded widths 14..22 of the 32-bit words)
        EngineConfig(width=6, height=8, auto_reset=True),
        EngineConfig(width=14, height=24, gravity_enabled=False),
        EngineConfig(width=9, height=15, padding=4, queue_size=3, auto_reset=True),
    ],
    ids=[
        "default", "autoreset", "uniform-autoreset", "no-gravity", "big-queue",
        "tiny-6x8", "wide-14x24", "odd-9x15",
    ],
)
def test_trajectory_equivalence(config):
    """200 random steps, 16 envs: every field equal at every step."""
    B, T = 16, 200
    keys = batch_keys(jax.random.PRNGKey(3), B)
    es = _flagship_batch(keys, config)
    ts = turbo.init(keys, config)
    _assert_states_match(ts, es, "init")

    f_step = jax.jit(jax.vmap(functools.partial(
        engine.step, config=config, obs_fn=lambda s, c, p: ())))
    t_step = turbo.jit_step(config)

    rng = np.random.default_rng(0)
    for i in range(T):
        acts = jnp.asarray(rng.integers(0, 8, size=B), dtype=jnp.int32)
        es, _, er, ed, einfo = f_step(es, acts)
        ts, _, tr, td, tinfo = t_step(ts, acts)
        _assert_states_match(ts, es, i)
        np.testing.assert_allclose(np.asarray(tr), np.asarray(er), err_msg=f"reward @ {i}")
        np.testing.assert_array_equal(np.asarray(td), np.asarray(ed), err_msg=f"done @ {i}")
        np.testing.assert_array_equal(
            np.asarray(tinfo["lines_cleared"]), np.asarray(einfo["lines_cleared"]),
            err_msg=f"lines @ {i}",
        )


def test_observe_board_equivalence():
    """Turbo board obs == flagship board obs along a random trajectory."""
    config = EngineConfig(auto_reset=True)
    B, T = 8, 120
    keys = batch_keys(jax.random.PRNGKey(11), B)
    es = _flagship_batch(keys, config)
    ts = turbo.init(keys, config)

    f_step = jax.jit(jax.vmap(functools.partial(
        engine.step, config=config, obs_fn=engine.observe_board)))
    t_step = turbo.jit_step(config)
    t_obs = jax.jit(functools.partial(turbo.observe_board, config=config))

    rng = np.random.default_rng(5)
    for i in range(T):
        acts = jnp.asarray(rng.integers(0, 8, size=B), dtype=jnp.int32)
        es, eobs, *_ = f_step(es, acts)
        ts, *_ = t_step(ts, acts)
        np.testing.assert_array_equal(
            np.asarray(t_obs(ts)), np.asarray(eobs), err_msg=f"obs @ {i}"
        )


def test_rollout_scan_equivalence():
    """turbo.rollout (scan) == stepwise turbo stepping."""
    config = EngineConfig(auto_reset=True)
    B, T = 8, 64
    keys = batch_keys(jax.random.PRNGKey(2), B)
    ts0 = turbo.init(keys, config)
    acts = jnp.asarray(
        np.random.default_rng(9).integers(0, 8, size=(T, B)), dtype=jnp.int32
    )

    final, (obs, rews, dones, lines) = jax.jit(
        functools.partial(turbo.rollout, config=config)
    )(ts0, acts)

    ts = ts0
    t_step = turbo.jit_step(config)
    got_r = []
    for i in range(T):
        ts, _, r, d, _ = t_step(ts, acts[i])
        got_r.append(np.asarray(r))
    np.testing.assert_allclose(np.asarray(rews), np.stack(got_r))
    np.testing.assert_array_equal(np.asarray(final.rows), np.asarray(ts.rows))


def test_clear_lines_batchminor_matches_bitboard():
    """_clear_lines in [H, B] layout == per-env ops.bitboard.clear_lines."""
    config = EngineConfig()
    rng = np.random.default_rng(4)
    H = config.padded_height
    boards = []
    for _ in range(32):
        board = np.asarray(
            jax.jit(functools.partial(
                engine.init_state, config=config))(jnp.array([1, 2], jnp.uint32)).board
        ).copy()
        # random stack with some fully-filled rows
        for r in range(10, config.height):
            if rng.random() < 0.5:
                board[r, config.padding:-config.padding] = rng.integers(
                    0, 3, size=config.width
                )
        n_full = rng.integers(0, 5)
        full_rows = rng.choice(np.arange(config.height), size=n_full, replace=False)
        for r in full_rows:
            board[r, config.padding:-config.padding] = 2
        boards.append(board)
    packed = np.stack([np.asarray(bb.pack_board(jnp.asarray(b))) for b in boards])

    got, n = jax.jit(functools.partial(
        turbo._clear_lines, config=config, max_clear=4))(jnp.asarray(packed.T))

    for i, b in enumerate(boards):
        want_rows, want_n, _ = bb.clear_lines(
            jnp.asarray(packed[i]), config.height, config.width, config.padding
        )
        assert int(n[i]) == int(want_n), f"env {i}"
        np.testing.assert_array_equal(
            np.asarray(got[:, i]), np.asarray(want_rows), err_msg=f"env {i}"
        )


def test_from_flagship_roundtrip():
    config = EngineConfig()
    keys = batch_keys(jax.random.PRNGKey(1), 4)
    es = _flagship_batch(keys, config)
    ts = turbo.from_flagship(es, config)
    _assert_states_match(ts, es, "convert")


def test_shuffle_batched_matches_scalar():
    """Batched counter-RNG shuffle == per-env scalar shuffles."""
    from tetris_gymnasium_tpu.ops import rng as orng

    keys = np.stack([[i * 17 + 1, i + 3] for i in range(9)]).astype(np.uint32)
    k_b, perm_b = orng.shuffle(jnp.asarray(keys.T), 7)
    for i in range(9):
        k_s, perm_s = orng.shuffle(jnp.asarray(keys[i]), 7)
        np.testing.assert_array_equal(np.asarray(perm_b[:, i]), np.asarray(perm_s))
        np.testing.assert_array_equal(np.asarray(k_b[:, i]), np.asarray(k_s))


# ---------------------------------------------------------------------------
# max_clear envelope (board surgery beyond the engine-reachable invariant)
# ---------------------------------------------------------------------------


def _surgery_states(config, n_full_rows=5):
    """Flagship + turbo batch (B=2) with ``n_full_rows`` pre-filled rows —
    beyond the engine-reachable envelope (the reference's own test style is
    direct board surgery, ref: tests/test_base_env/test_base_env_movement.py)."""
    keys = batch_keys(jax.random.PRNGKey(77), 2)
    es = _flagship_batch(keys, config)
    board = np.array(es.board)  # copy: np.asarray of a jax array is read-only
    pad, H, W = config.padding, config.height, config.width
    board[:, H - n_full_rows : H, pad : pad + W] = 2  # 5 full playfield rows
    es = es.replace(board=jnp.asarray(board))
    return es, turbo.from_flagship(es, config)


def test_surgery_five_rows_clears_correctly_with_max_clear_override():
    """Hard-dropping onto 5 pre-filled rows: flagship clears all 5; turbo
    matches when told the envelope (max_clear=height)."""
    config = EngineConfig(auto_reset=False)
    es, ts = _surgery_states(config)
    drop = jnp.full((2,), 5, jnp.int32)

    es2, _, _, _, einfo = engine.batched_step(es, drop, config=config, obs="board")
    ts2, _, _, _, tinfo = jax.jit(
        functools.partial(turbo.step, config=config, max_clear=config.height)
    )(ts, drop)

    assert (np.asarray(einfo["lines_cleared"]) >= 5).all()
    np.testing.assert_array_equal(
        np.asarray(tinfo["lines_cleared"]), np.asarray(einfo["lines_cleared"])
    )
    _assert_states_match(ts2, es2, "surgery")


def test_surgery_overflow_raises_under_debug_flag(monkeypatch):
    """Default max_clear=4 cannot represent a 5-row clear; with
    TETRIS_TPU_DEBUG=1 the engine fails loudly instead of compacting wrong."""
    monkeypatch.setenv("TETRIS_TPU_DEBUG", "1")
    config = EngineConfig(auto_reset=False)
    _, ts = _surgery_states(config)
    drop = jnp.full((2,), 5, jnp.int32)
    with pytest.raises(Exception, match="max_clear"):
        out = jax.jit(functools.partial(turbo.step, config=config))(ts, drop)
        jax.block_until_ready(out)


def test_surgery_within_envelope_is_silent_under_debug_flag(monkeypatch):
    """4 pre-filled rows stay inside the envelope: debug mode must not fire."""
    monkeypatch.setenv("TETRIS_TPU_DEBUG", "1")
    config = EngineConfig(auto_reset=False)
    es, ts = _surgery_states(config, n_full_rows=4)
    drop = jnp.full((2,), 5, jnp.int32)
    es2, _, _, _, einfo = engine.batched_step(es, drop, config=config, obs="board")
    ts2, _, _, _, tinfo = jax.jit(functools.partial(turbo.step, config=config))(ts, drop)
    jax.block_until_ready(ts2)
    np.testing.assert_array_equal(
        np.asarray(tinfo["lines_cleared"]), np.asarray(einfo["lines_cleared"])
    )
    _assert_states_match(ts2, es2, "surgery4")


def test_surgery_overflow_terminates_always_on():
    """ALWAYS-ON safety (no debug flag): > max_clear simultaneously-full
    rows terminate the env (game_over + its reward) instead of playing on
    from a mis-compacted board."""
    config = EngineConfig(auto_reset=False)
    es, ts = _surgery_states(config, n_full_rows=5)
    drop = jnp.full((2,), 5, jnp.int32)
    ts2, _, tr, td, _ = jax.jit(functools.partial(turbo.step, config=config))(ts, drop)
    assert np.asarray(td).all(), "overflow must terminate"
    assert np.asarray(ts2.game_over).all()
    np.testing.assert_allclose(np.asarray(tr), 0.0)  # game_over reward


def test_surgery_overflow_autoreset_restarts_cleanly():
    """Under auto_reset the overflow-terminated env restarts as a fresh
    episode (empty playfield) — defined behavior, never a corrupt board."""
    config = EngineConfig(auto_reset=True)
    _, ts = _surgery_states(config, n_full_rows=5)
    drop = jnp.full((2,), 5, jnp.int32)
    ts2, _, _, td, _ = jax.jit(functools.partial(turbo.step, config=config))(ts, drop)
    assert np.asarray(td).all()
    fresh_rows = np.asarray(
        jnp.asarray(bb.empty_rows(config.height, config.width, config.padding))
    )
    np.testing.assert_array_equal(np.asarray(ts2.rows), fresh_rows[:, None].repeat(2, 1))
    assert not np.asarray(ts2.game_over).any()


def test_surgery_overflow_grouped_candidates_are_game_over():
    """Grouped engine on a 5-full-row board: every resting candidate is a
    game-over placement (zeros sentinel), none silently mis-compacts."""
    from tetris_gymnasium_tpu.core import turbo_grouped

    config = EngineConfig(gravity_enabled=False, auto_reset=False)
    _, ts = _surgery_states(config, n_full_rows=5)
    feats, mask, game_over, lines = turbo_grouped.placements(ts, config)
    legal = np.asarray(mask) > 0
    assert legal.any()
    # every legal candidate rests on the 5-row stack -> overflow -> game over
    assert np.asarray(game_over)[legal].all()
    assert (np.asarray(lines)[legal] == 0).all()
    # game-over sentinel features are all-zeros (ref: grouped.py:164-177)
    f = np.asarray(feats)  # [F, A, B]
    assert (f.transpose(1, 2, 0)[legal] == 0).all()
    # with the envelope widened the same candidates clear 5+ rows normally
    _, _, go_wide, lines_wide = turbo_grouped.placements(
        ts, config, max_clear=config.height
    )
    assert (np.asarray(lines_wide)[legal] >= 5).all()
    assert not np.asarray(go_wide)[legal].any()
