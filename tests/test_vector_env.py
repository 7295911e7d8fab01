"""Gymnasium ``VectorEnv`` adapter: API contract, autoreset, engine parity.

The reference's training stacks consume envs through ``gym.vector``
(ref: examples/train_cnn.py:251-256); these tests pin that the adapter
honors the Gymnasium vector contract (spaces, dtypes, SAME_STEP autoreset
with ``final_obs``) while producing exactly the batched engine's
trajectories, and that a reference-style third-party loop (numpy policy +
RecordEpisodeStatistics) runs unchanged on top of it.
"""
import numpy as np
import pytest

import gymnasium as gym
from gymnasium.vector import AutoresetMode

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import turbo
from tetris_gymnasium_tpu.envs.vector_env import TetrisVectorEnv

B = 8


@pytest.fixture(params=["turbo", "flagship"])
def venv(request):
    return TetrisVectorEnv(B, EngineConfig(), impl=request.param, seed=7)


def test_vector_api_contract(venv):
    assert isinstance(venv, gym.vector.VectorEnv)
    assert venv.num_envs == B
    assert venv.metadata["autoreset_mode"] == AutoresetMode.SAME_STEP
    obs, infos = venv.reset(seed=3)
    assert obs.shape == (B, 20, 10) and obs.dtype == np.int8
    assert venv.observation_space.contains(obs)
    assert isinstance(infos, dict)

    actions = np.full(B, 7)  # no-op
    obs, rew, term, trunc, infos = venv.step(actions)
    assert venv.observation_space.contains(obs)
    assert rew.shape == (B,) and rew.dtype == np.float32
    assert term.shape == (B,) and term.dtype == bool
    assert trunc.shape == (B,) and trunc.dtype == bool
    assert not trunc.any()
    assert infos["lines_cleared"].shape == (B,)


def test_reset_seed_determinism(venv):
    obs1, _ = venv.reset(seed=11)
    seq1 = []
    rng = np.random.default_rng(0)
    for _ in range(10):
        o, r, t, _, _ = venv.step(rng.integers(0, 8, B))
        seq1.append((o.copy(), r.copy(), t.copy()))
    obs2, _ = venv.reset(seed=11)
    np.testing.assert_array_equal(obs1, obs2)
    rng = np.random.default_rng(0)
    for o1, r1, t1 in seq1:
        o, r, t, _, _ = venv.step(rng.integers(0, 8, B))
        np.testing.assert_array_equal(o, o1)
        np.testing.assert_array_equal(r, r1)
        np.testing.assert_array_equal(t, t1)


def test_same_step_autoreset_delivers_final_obs(venv):
    venv.reset(seed=5)
    drop = np.full(B, 5)  # hard-drop spam forces quick game-overs
    for step_i in range(60):
        obs, rew, term, trunc, infos = venv.step(drop)
        if term.any():
            assert "final_obs" in infos and "_final_obs" in infos
            np.testing.assert_array_equal(infos["_final_obs"], term)
            # Gymnasium SAME_STEP convention: object array, None for live
            # envs (consumers run `final_obs[i] is not None` loops)
            assert infos["final_obs"].dtype == object
            for b in np.nonzero(~term)[0]:
                assert infos["final_obs"][b] is None
            for b in np.nonzero(term)[0]:
                # terminal board is a dead stack; the same-step reset obs is
                # a fresh episode's first observation (near-empty board)
                final = infos["final_obs"][b]
                fresh = obs[b]
                assert (final != 0).sum() > (fresh != 0).sum()
            return
    pytest.fail("hard-drop spam never terminated an episode")


def test_trajectories_match_turbo_engine_directly():
    """The adapter adds autoreset/numpy IO but must not change the game:
    rewards/terminations equal a hand-driven turbo rollout from the same
    keys until the first termination."""
    config = EngineConfig()
    venv = TetrisVectorEnv(B, config, impl="turbo", seed=9)
    obs_v, _ = venv.reset(seed=9)

    # reproduce the adapter's key discipline for epoch 0
    base = jax.random.fold_in(jax.random.PRNGKey(9), 0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(B, dtype=jnp.uint32)
    )
    cfg_nr = config._replace(auto_reset=False)
    states = turbo.init(keys, cfg_nr)
    np.testing.assert_array_equal(
        obs_v, np.asarray(turbo.observe_board(states, cfg_nr))
    )

    rng = np.random.default_rng(1)
    alive = np.ones(B, dtype=bool)
    for _ in range(15):
        acts = rng.integers(0, 8, B)
        obs_v, rew_v, term_v, _, _ = venv.step(acts)
        states, _, rew_e, term_e, _ = turbo.jit_step(cfg_nr)(
            states, jnp.asarray(acts, jnp.int32)
        )
        np.testing.assert_array_equal(rew_v[alive], np.asarray(rew_e)[alive])
        np.testing.assert_array_equal(term_v[alive], np.asarray(term_e)[alive])
        alive &= ~term_v  # after termination the adapter restarts, engine freezes


def test_third_party_style_loop_runs():
    """Reference consumption pattern: vector env + episode-statistics wrapper
    + numpy epsilon-greedy loop (ref: examples/train_cnn.py:251-296)."""
    venv = TetrisVectorEnv(16, EngineConfig(), impl="turbo", seed=1)
    wrapped = gym.wrappers.vector.RecordEpisodeStatistics(venv)
    obs, _ = wrapped.reset(seed=1)
    episodes = 0
    rng = np.random.default_rng(2)
    for _ in range(200):
        actions = rng.integers(0, 8, wrapped.num_envs)
        obs, rew, term, trunc, infos = wrapped.step(actions)
        if "episode" in infos:
            episodes += int(np.sum(infos["_episode"]))
    assert episodes > 0, "no episodes completed through the wrapper stack"


def test_vector_env_oversize_pieces_on_turbo():
    """TetrisVectorEnv(impl='turbo') plays a 6x6-box custom set — the turbo
    entry point that used to raise NotImplementedError (round-4 missing #3);
    multi-word piece tables carry it now."""
    from tetris_gymnasium_tpu.components.tetromino import Tetromino

    tets = [
        Tetromino(2, (255, 0, 0), np.array([[1, 1], [1, 1]], np.uint8)),
        Tetromino(3, (0, 255, 0), np.ones((1, 6), np.uint8)),
        Tetromino(4, (0, 0, 255), np.array(
            [[0, 1, 0], [1, 1, 1], [0, 0, 0]], np.uint8)),
    ]
    env = TetrisVectorEnv(
        8,
        EngineConfig(width=8, height=12, queue_size=2, queue_kind="uniform"),
        impl="turbo",
        tetrominoes=tets,
    )
    obs, _ = env.reset(seed=0)
    assert obs.shape == (8, 12, 8)
    rng = np.random.default_rng(0)
    deaths = 0
    for _ in range(200):
        obs, r, term, trunc, infos = env.step(rng.integers(0, 8, size=8))
        deaths += int(term.sum())
    assert deaths > 0  # auto-reset restarts crossed
    env.close()
