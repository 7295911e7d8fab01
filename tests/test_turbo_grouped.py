"""Turbo grouped engine ≡ flagship grouped engine, field for field.

The turbo grouped engine re-implements the placement MDP on bit-packed
batch-minor kernels; these tests pin it against the flagship grouped engine
(core/grouped.py) — masks, feature observations, rewards, terminations,
lines and resulting env states must match exactly from the same keys, over
long random-placement trajectories.  The flagship grouped suite
(tests/test_grouped.py) anchors those semantics to the reference golden CSV
and literal mask, so equality here transitively inherits reference parity.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import grouped, turbo, turbo_grouped
from tetris_gymnasium_tpu.ops import bitboard as bb
from tetris_gymnasium_tpu.parallel.mesh import batch_keys

CFG = EngineConfig(gravity_enabled=False, auto_reset=True)
CFG_NR = EngineConfig(gravity_enabled=False, auto_reset=False)
B = 8


def flagship_batch(cfg, seed=0):
    keys = batch_keys(jax.random.PRNGKey(seed), B)
    return grouped.batched_reset(keys, config=cfg, mode="features")


def to_turbo(gs, cfg):
    env = turbo.from_flagship(gs.env, cfg)
    return turbo_grouped.TurboGroupedState(env=env, mask=gs.mask.T)


def assert_env_equal(tenv, fenv, cfg):
    """Turbo env state == flagship env state (occupancy for the board)."""
    pack = jax.vmap(bb.pack_board)
    np.testing.assert_array_equal(np.asarray(tenv.rows), np.asarray(pack(fenv.board)).T)
    for name in (
        "piece", "rotation", "x", "y", "bag_index", "game_over",
        "score", "lines", "steps", "holder_count", "has_swapped",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(tenv, name)), np.asarray(getattr(fenv, name)), err_msg=name
        )
    for name in ("bag", "queue", "holder_piece", "holder_rotation", "key"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tenv, name)), np.asarray(getattr(fenv, name)).T, err_msg=name
        )


@pytest.mark.parametrize("cfg", [CFG, CFG_NR], ids=["autoreset", "no-autoreset"])
def test_reset_observation_matches_flagship(cfg):
    fgs, fobs = flagship_batch(cfg, seed=3)
    keys = batch_keys(jax.random.PRNGKey(3), B)
    tgs, tobs = turbo_grouped.reset(keys, cfg)
    assert_env_equal(tgs.env, fgs.env, cfg)
    np.testing.assert_array_equal(np.asarray(tgs.mask).T, np.asarray(fgs.mask))
    np.testing.assert_array_equal(np.asarray(tobs), np.asarray(fobs))


def test_placements_match_flagship_on_played_boards():
    """After some play, candidate features/masks still match exactly."""
    cfg = CFG
    fgs, _ = flagship_batch(cfg, seed=5)
    rng = np.random.default_rng(5)
    for _ in range(6):
        legal = np.asarray(fgs.mask)
        acts = jnp.asarray(
            [rng.choice(np.nonzero(legal[b])[0]) for b in range(B)], dtype=jnp.int32
        )
        fgs, fobs, *_ = grouped.batched_step(fgs, acts, config=cfg, mode="features")
    tgs = to_turbo(fgs, cfg)
    tobs, tmask = turbo_grouped.observation(tgs.env, cfg)
    np.testing.assert_array_equal(np.asarray(tmask).T, np.asarray(fgs.mask))
    np.testing.assert_array_equal(np.asarray(tobs), np.asarray(fobs))


@pytest.mark.parametrize(
    "cfg,terminate",
    [
        (CFG, True),
        (CFG_NR, True),
        (CFG, False),
        # nonstandard geometry: candidate enumeration (A = width*4), spawn
        # centering and the [H, A, B] kernels must hold off the default board
        (EngineConfig(width=7, height=12, gravity_enabled=False, auto_reset=True), True),
    ],
    ids=["autoreset-term", "noreset-term", "autoreset-noop", "odd-7x12"],
)
def test_random_trajectories_match_flagship(cfg, terminate):
    """Long random placement rollouts: every output equal every step
    (including illegal actions to hit the sentinel/penalty paths)."""
    keys = batch_keys(jax.random.PRNGKey(11), B)
    fgs, _ = grouped.batched_reset(
        keys, config=cfg, mode="features", terminate_on_illegal=terminate
    )
    tgs, _ = turbo_grouped.reset(keys, cfg)
    np.testing.assert_array_equal(np.asarray(tgs.mask).T, np.asarray(fgs.mask))

    tstep = jax.jit(
        functools.partial(turbo_grouped.step, config=cfg, terminate_on_illegal=terminate)
    )
    rng = np.random.default_rng(7)
    A = cfg.width * 4
    for step_i in range(40):
        # mostly-legal actions with occasional deliberate illegals
        legal = np.asarray(fgs.mask)
        acts = []
        for b in range(B):
            if rng.random() < 0.15:
                acts.append(int(rng.integers(0, A)))
            else:
                options = np.nonzero(legal[b])[0]
                acts.append(int(rng.choice(options)) if len(options) else 0)
        acts = jnp.asarray(acts, dtype=jnp.int32)

        fgs, fobs, frew, fdone, finfo = grouped.batched_step(
            fgs, acts, config=cfg, mode="features", terminate_on_illegal=terminate
        )
        tgs, tobs, trew, tdone, tinfo = tstep(tgs, acts)

        np.testing.assert_array_equal(np.asarray(trew), np.asarray(frew), err_msg=f"step {step_i}")
        np.testing.assert_array_equal(np.asarray(tdone), np.asarray(fdone))
        np.testing.assert_array_equal(
            np.asarray(tinfo["lines_cleared"]), np.asarray(finfo["lines_cleared"])
        )
        np.testing.assert_array_equal(np.asarray(tobs), np.asarray(fobs), err_msg=f"obs step {step_i}")
        np.testing.assert_array_equal(np.asarray(tgs.mask).T, np.asarray(fgs.mask))
        assert_env_equal(tgs.env, fgs.env, cfg)


# ---------------------------------------------------------------------------
# mode="boards": binary per-candidate board images
# ---------------------------------------------------------------------------


def flagship_boards_binary(fobs, cfg):
    """Flagship id-palette boards -> cropped binary occupancy ``[.., A, H, W]``.

    The flagship/reference grouped obs is the full padded id-board
    (ref: wrappers/grouped.py:67-72); the turbo boards mode emits binary
    cropped playfields, so parity is pinned on occupancy after the same crop
    the feature path uses (core/grouped.py:grouped_observation).
    """
    pad, H = cfg.padding, cfg.height
    crop = np.asarray(fobs)[..., :H, pad:-pad]
    return (crop > 0).astype(np.float32)


@pytest.mark.parametrize("cfg", [CFG, CFG_NR], ids=["autoreset", "no-autoreset"])
def test_boards_reset_matches_flagship(cfg):
    fgs, fobs = grouped.batched_reset(
        batch_keys(jax.random.PRNGKey(21), B), config=cfg, mode="boards"
    )
    tgs, tobs = turbo_grouped.reset(batch_keys(jax.random.PRNGKey(21), B), cfg, mode="boards")
    assert tobs.shape == (B, cfg.width * 4, cfg.height, cfg.width)
    np.testing.assert_array_equal(np.asarray(tgs.mask).T, np.asarray(fgs.mask))
    np.testing.assert_array_equal(np.asarray(tobs), flagship_boards_binary(fobs, cfg))


def test_boards_sentinels_present_and_match():
    """A played board yields illegal (all-ones) and game-over (all-zeros)
    candidates; the sentinels must match the flagship's after binarize."""
    cfg = CFG_NR
    fgs, _ = grouped.batched_reset(
        batch_keys(jax.random.PRNGKey(23), B), config=cfg, mode="boards"
    )
    rng = np.random.default_rng(23)
    for _ in range(8):
        legal = np.asarray(fgs.mask)
        acts = jnp.asarray(
            [rng.choice(np.nonzero(legal[b])[0]) if legal[b].any() else 0 for b in range(B)],
            dtype=jnp.int32,
        )
        fgs, fobs, *_ = grouped.batched_step(fgs, acts, config=cfg, mode="boards")
    # at least one illegal candidate must exist across the batch (I/J pieces
    # against the wall make frame-hits routine)
    assert (np.asarray(fgs.mask) == 0).any()
    tgs = to_turbo(fgs, cfg)
    tobs, tmask = turbo_grouped.observation(tgs.env, cfg, mode="boards")
    np.testing.assert_array_equal(np.asarray(tmask).T, np.asarray(fgs.mask))
    np.testing.assert_array_equal(np.asarray(tobs), flagship_boards_binary(fobs, cfg))
    # explicit sentinel check: every illegal candidate's board is all ones
    tobs_np, mask_np = np.asarray(tobs), np.asarray(tmask).T
    for b in range(B):
        for a in np.nonzero(mask_np[b] == 0)[0]:
            assert (tobs_np[b, a] == 1.0).all()


@pytest.mark.parametrize("terminate", [True, False], ids=["term", "noop"])
def test_boards_trajectories_match_flagship(terminate):
    """Random placement rollouts in boards mode: rewards/done/lines/masks and
    binarized observations equal every step, incl. the illegal-action
    ``high`` sentinel obs."""
    cfg = CFG
    keys = batch_keys(jax.random.PRNGKey(29), B)
    fgs, _ = grouped.batched_reset(
        keys, config=cfg, mode="boards", terminate_on_illegal=terminate
    )
    tgs, _ = turbo_grouped.reset(keys, cfg, mode="boards")
    tstep = jax.jit(
        functools.partial(
            turbo_grouped.step, config=cfg, mode="boards", terminate_on_illegal=terminate
        )
    )
    rng = np.random.default_rng(31)
    A = cfg.width * 4
    high = float(cfg.height * cfg.width)
    for step_i in range(25):
        legal = np.asarray(fgs.mask)
        acts = []
        for b in range(B):
            if rng.random() < 0.2:
                acts.append(int(rng.integers(0, A)))
            else:
                options = np.nonzero(legal[b])[0]
                acts.append(int(rng.choice(options)) if len(options) else 0)
        was_illegal = np.asarray([legal[b, a] == 0 for b, a in enumerate(acts)])
        acts = jnp.asarray(acts, dtype=jnp.int32)

        fgs, fobs, frew, fdone, finfo = grouped.batched_step(
            fgs, acts, config=cfg, mode="boards", terminate_on_illegal=terminate
        )
        tgs, tobs, trew, tdone, tinfo = tstep(tgs, acts)

        np.testing.assert_array_equal(np.asarray(trew), np.asarray(frew), err_msg=f"step {step_i}")
        np.testing.assert_array_equal(np.asarray(tdone), np.asarray(fdone))
        np.testing.assert_array_equal(
            np.asarray(tinfo["lines_cleared"]), np.asarray(finfo["lines_cleared"])
        )
        np.testing.assert_array_equal(np.asarray(tgs.mask).T, np.asarray(fgs.mask))
        assert_env_equal(tgs.env, fgs.env, cfg)

        tobs_np, fobs_np = np.asarray(tobs), np.asarray(fobs)
        if terminate:
            for b in range(B):
                if was_illegal[b]:
                    # both engines emit the flat `high` sentinel obs
                    assert (tobs_np[b] == high).all()
                    assert (fobs_np[b] == high).all()
                else:
                    np.testing.assert_array_equal(
                        tobs_np[b], flagship_boards_binary(fobs_np[b], cfg),
                        err_msg=f"obs step {step_i} env {b}",
                    )
        else:
            np.testing.assert_array_equal(tobs_np, flagship_boards_binary(fobs_np, cfg))
