"""Wide boards (padded width > 32) on the feature-complete engines.

Round-3's last capability gap: the reference OOP env accepts any
``width``/``height`` (ref: tetris_gymnasium/envs/tetris.py:77-107) while the
flagship/turbo engines packed rows into ONE uint32.  With
:mod:`ops.bitboard_wide` the same engines now serve any geometry; these
tests pin that the wide path plays the identical game:

- turbo == flagship field-for-field at wide geometries (the single-word
  suite's exact pattern, tests/test_turbo.py);
- grouped turbo == grouped flagship at width 30 (masks, features, boards);
- engineered line clears across word boundaries agree cross-engine;
- ``Tetris(width=30)`` plays a full scripted game through the Gym shell;
- scripted mechanics parity against the reference OOP env at width 30.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig
from tetris_gymnasium_tpu.core import engine, grouped, turbo, turbo_grouped
from tetris_gymnasium_tpu.ops import bitboard_wide as bw
from tetris_gymnasium_tpu.parallel.mesh import batch_keys

A = ActionsMapping()

WIDE_CONFIGS = [
    EngineConfig(width=30, height=20, auto_reset=True),
    EngineConfig(width=30, height=20, gravity_enabled=False),
    EngineConfig(width=61, height=12, queue_size=3, auto_reset=True),
    EngineConfig(width=28, height=14, auto_reset=True),  # word-0 bit 31 in play
]
WIDE_IDS = ["wide-30x20", "wide-30x20-nograv", "wide-61x12", "wide-28x14"]


def _flagship_batch(keys, config):
    return jax.jit(jax.vmap(functools.partial(engine.init_state, config=config)))(keys)


def _assert_states_match(ts, es, step_i):
    """Turbo state vs batched flagship state, wide layout ([H, NW, B])."""
    packed = jax.vmap(bw.pack_board)(es.board)  # [B, H, NW]
    np.testing.assert_array_equal(
        np.asarray(ts.rows),
        np.asarray(jnp.transpose(packed, (1, 2, 0))),
        err_msg=f"rows @ {step_i}",
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


@pytest.mark.parametrize("config", WIDE_CONFIGS, ids=WIDE_IDS)
def test_turbo_trajectory_equivalence_wide(config):
    """120 random steps, 8 envs: every field equal at every step."""
    B, T = 8, 120
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


def test_observe_board_equivalence_wide():
    config = EngineConfig(width=30, height=20, auto_reset=True)
    B, T = 8, 60
    keys = batch_keys(jax.random.PRNGKey(11), B)
    es = _flagship_batch(keys, config)
    ts = turbo.init(keys, config)
    f_step = jax.jit(jax.vmap(functools.partial(
        engine.step, config=config, obs_fn=engine.observe_board)))
    t_step = jax.jit(functools.partial(
        turbo.step, config=config, obs_fn=turbo.observe_board))
    rng = np.random.default_rng(2)
    for i in range(T):
        acts = jnp.asarray(rng.integers(0, 8, size=B), dtype=jnp.int32)
        es, eobs, *_ = f_step(es, acts)
        ts, tobs, *_ = t_step(ts, acts)
        np.testing.assert_array_equal(np.asarray(tobs), np.asarray(eobs), err_msg=f"@ {i}")


# ---------------------------------------------------------------------------
# Engineered line clears across word boundaries
# ---------------------------------------------------------------------------


def _surgery_states(config, gap_col, n_rows=1):
    """Both-engine batch (B=2) whose bottom ``n_rows`` playfield rows are full
    except a 4-wide gap at ``gap_col``, with a flat I piece parked over it."""
    keys = batch_keys(jax.random.PRNGKey(7), 2)
    es = _flagship_batch(keys, config)
    board = np.array(es.board)
    pad, H, W = config.padding, config.height, config.width
    board[:, H - n_rows : H, pad : pad + W] = 2
    board[:, H - n_rows : H, pad + gap_col : pad + gap_col + 4] = 0
    es = es.replace(
        board=jnp.asarray(board),
        piece=jnp.zeros(2, jnp.int32),  # I piece (flat row in box row 1)
        rotation=jnp.zeros(2, jnp.int32),
        x=jnp.full((2,), gap_col + pad, jnp.int32),
        y=jnp.zeros(2, jnp.int32),
    )
    return es, turbo.from_flagship(es, config)


@pytest.mark.parametrize("gap_col", [0, 26, 12, 14])  # 12..15, 14..17 straddle words
@pytest.mark.parametrize("n_rows", [1, 2])
def test_wide_line_clear_cross_engine(gap_col, n_rows):
    """Dropping the I into the gap clears the engineered rows identically on
    both engines — including gaps straddling the 32-bit word boundary."""
    config = EngineConfig(width=30, height=20, auto_reset=False)
    es, ts = _surgery_states(config, gap_col, n_rows)
    drop = jnp.full((2,), A.hard_drop, jnp.int32)

    es2, _, er, ed, einfo = engine.batched_step(es, drop, config=config, obs="board")
    ts2, _, tr, td, tinfo = turbo.jit_step(config)(ts, drop)

    # n_rows=1: the flat I exactly plugs the gap; n_rows=2: it plugs the top
    # gap row only (the row below keeps its hole), still one clear.
    assert (np.asarray(einfo["lines_cleared"]) == 1).all()
    np.testing.assert_array_equal(
        np.asarray(tinfo["lines_cleared"]), np.asarray(einfo["lines_cleared"])
    )
    np.testing.assert_allclose(np.asarray(tr), np.asarray(er))
    np.testing.assert_array_equal(np.asarray(td), np.asarray(ed))
    _assert_states_match(ts2, es2, "clear")


# ---------------------------------------------------------------------------
# Grouped engines at wide geometry
# ---------------------------------------------------------------------------


def test_turbo_grouped_matches_flagship_wide():
    """Masked-random placements at width 30: obs/mask/reward/done/lines and
    env states equal at every step (features mode)."""
    cfg = EngineConfig(width=30, height=14, gravity_enabled=False, auto_reset=True)
    B, T = 4, 12
    keys = batch_keys(jax.random.PRNGKey(5), B)
    fgs, fobs = grouped.batched_reset(keys, config=cfg, mode="features")
    tgs, tobs = turbo_grouped.reset(keys, cfg)
    np.testing.assert_array_equal(np.asarray(tobs), np.asarray(fobs))
    np.testing.assert_array_equal(np.asarray(tgs.mask).T, np.asarray(fgs.mask))

    rng = np.random.default_rng(4)
    t_step = turbo_grouped.jit_step(cfg)
    for i in range(T):
        legal = np.asarray(fgs.mask)
        acts = jnp.asarray(
            [rng.choice(np.nonzero(legal[b])[0]) for b in range(B)], dtype=jnp.int32
        )
        fgs, fobs, fr, fd, finfo = grouped.batched_step(fgs, acts, config=cfg, mode="features")
        tgs, tobs, tr, td, tinfo = t_step(tgs, acts)
        np.testing.assert_array_equal(np.asarray(tobs), np.asarray(fobs), err_msg=f"obs @ {i}")
        np.testing.assert_allclose(np.asarray(tr), np.asarray(fr), err_msg=f"reward @ {i}")
        np.testing.assert_array_equal(np.asarray(td), np.asarray(fd), err_msg=f"done @ {i}")
        np.testing.assert_array_equal(
            np.asarray(tinfo["lines_cleared"]), np.asarray(finfo["lines_cleared"]),
            err_msg=f"lines @ {i}",
        )


def test_turbo_grouped_boards_mode_wide():
    """Boards mode at width 30: candidate board images match the flagship's
    binarized candidate boards at reset."""
    cfg = EngineConfig(width=30, height=10, gravity_enabled=False, auto_reset=True)
    keys = batch_keys(jax.random.PRNGKey(9), 2)
    fgs, fobs = grouped.batched_reset(keys, config=cfg, mode="boards")
    tgs, tobs = turbo_grouped.reset(keys, cfg, mode="boards")
    # flagship boards are padded id images; turbo boards are the binarized
    # playfield crop (same comparison as tests/test_turbo_grouped.py)
    H, pad = cfg.height, cfg.padding
    crop = (np.asarray(fobs)[..., :H, pad:-pad] > 0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(tobs), crop)


# ---------------------------------------------------------------------------
# Gym shell
# ---------------------------------------------------------------------------


def test_gym_shell_plays_wide_board():
    """``Tetris(width=30)`` plays a full scripted game to termination —
    the capability the reference OOP env always had (ref: envs/tetris.py:77-107)."""
    import gymnasium as gym

    import tetris_gymnasium_tpu.envs  # noqa: F401  (registration)

    env = gym.make("tetris_gymnasium_tpu/Tetris", width=30, height=20)
    obs, info = env.reset(seed=0)
    assert obs["board"].shape == (20 + 4, 30 + 8)
    script = [A.move_left, A.rotate_clockwise, A.move_right, A.swap, A.hard_drop]
    terminated, steps, total_r = False, 0, 0.0
    while not terminated and steps < 3000:
        obs, r, terminated, _, info = env.step(script[steps % len(script)])
        total_r += float(r)
        steps += 1
    assert terminated, "scripted wide-board game never terminated"
    assert steps > 10 and total_r > 0


# ---------------------------------------------------------------------------
# Reference OOP parity at width 30
# ---------------------------------------------------------------------------


@requires_reference
@pytest.mark.parametrize("gravity", [True, False])
def test_scripted_mechanics_parity_wide_vs_reference(gravity):
    """The single-word suite's scripted-parity pattern
    (tests/test_engine_vs_oop.py) at width 30: same pinned piece sequence,
    boards/rewards/terminations equal step for step."""
    from tests.test_engine_vs_oop import _make_my_state

    from tetris_gymnasium.components.tetromino_queue import TetrominoQueue
    from tetris_gymnasium.components.tetromino_randomizer import Randomizer
    from tetris_gymnasium.envs.tetris import Tetris

    class SequenceRandomizer(Randomizer):
        def __init__(self, size):
            super().__init__(size)
            self.i = 0

        def get_next_tetromino(self) -> int:
            v = self.i % self.size
            self.i += 1
            return v

        def reset(self, seed=None):
            self.i = 0

    ref = Tetris(width=30, height=20, gravity=gravity)
    rand = SequenceRandomizer(7)
    ref.randomizer = rand
    ref.queue = TetrominoQueue(rand)
    ref.reset(seed=1)

    cfg = EngineConfig(width=30, height=20, gravity_enabled=gravity)
    mine = _make_my_state(cfg)
    step = engine.jit_step(cfg)

    script = ([A.move_left] * 8 + [A.hard_drop]
              + [A.rotate_clockwise, A.move_right, A.move_right, A.hard_drop]
              + [A.swap, A.hard_drop, A.move_down, A.no_op] * 3) * 3
    for t, action in enumerate(script):
        mine = mine.replace(
            bag=jnp.arange(7, dtype=jnp.int32),
            bag_index=(mine.queue[-1] + 1) % 7,
        )
        ref_obs, ref_rew, ref_done, _, ref_info = ref.step(action)
        mine, my_obs, my_rew, my_done, my_info = step(mine, jnp.int32(action))

        assert float(ref_rew) == float(my_rew), f"reward @ step {t} (action {action})"
        assert bool(ref_done) == bool(my_done), f"done @ step {t}"
        assert int(ref_info["lines_cleared"]) == int(my_info["lines_cleared"]), f"lines @ {t}"
        assert np.array_equal(
            np.asarray(ref_obs["board"]), np.asarray(my_obs["board"])
        ), f"board image @ step {t}"
        if not bool(ref_done):
            assert ref.x == int(mine.x) and ref.y == int(mine.y), f"position @ {t}"
        if bool(ref_done):
            break


# ---------------------------------------------------------------------------
# Wrappers and vector env at wide geometry
# ---------------------------------------------------------------------------


def test_wrappers_on_wide_board():
    """RgbObservation and FeatureVectorObservation through the shell at
    width 30: shapes track the geometry, features value-check."""
    import gymnasium as gym

    import tetris_gymnasium_tpu.envs  # noqa: F401
    from tetris_gymnasium_tpu.wrappers import (
        FeatureVectorObservation,
        RgbObservation,
    )

    base = gym.make("tetris_gymnasium_tpu/Tetris", width=30, height=20)
    rgb_env = RgbObservation(base)
    obs, _ = rgb_env.reset(seed=1)
    pad = base.unwrapped.config.padding
    side = max(4, 1) * pad  # queue_size=4, holder_size=1
    assert obs.shape == (24, 38 + side, 3) and obs.dtype == np.uint8
    obs, *_ = rgb_env.step(A.hard_drop)
    assert obs.shape == (24, 38 + side, 3)

    feat_env = FeatureVectorObservation(gym.make(
        "tetris_gymnasium_tpu/Tetris", width=30, height=20
    ))
    fobs, _ = feat_env.reset(seed=1)
    assert fobs.shape == (30 + 3,)
    assert (fobs == 0).all()  # empty board: all heights/holes/bumpiness zero
    fobs, *_ = feat_env.step(A.hard_drop)
    assert fobs.max() > 0  # a locked piece raises some column height


def test_vector_env_wide_board():
    """TetrisVectorEnv at width 30 (multi-word turbo path under the numpy
    boundary): steps, terminates, delivers final_obs convention."""
    from tetris_gymnasium_tpu.envs import TetrisVectorEnv

    venv = TetrisVectorEnv(16, EngineConfig(width=30, height=20), seed=2)
    obs, _ = venv.reset(seed=2)
    assert obs.shape == (16, 20, 30)
    for _ in range(80):
        obs, r, term, trunc, infos = venv.step(np.full(16, A.hard_drop))
        if term.any():
            assert infos["final_obs"].dtype == object
            assert infos["final_obs"][np.nonzero(term)[0][0]].shape == (20, 30)
            return
    pytest.fail("wide-board vector env never terminated under drop spam")
