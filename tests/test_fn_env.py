"""Standalone behavioural tests of the compat engine (no reference needed).

Covers the reference test strategy's JAX-equivalence and determinism patterns
(ref: tests/test_functional/test_jax_compat.py, test_batched.py,
test_integration.py) against our own engine.  Trajectories run under
``lax.scan`` so each test is one compiled program + one host sync.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tetris_gymnasium_tpu.config import EnvConfig
from tetris_gymnasium_tpu.core import fn_env

CFG = EnvConfig()
_ROLLOUT = jax.jit(lambda s, a: fn_env.rollout(s, a, CFG))


def _traj(key_seed, action_seed, n):
    _, state, _ = fn_env.jit_reset(CFG)(jax.random.PRNGKey(key_seed))
    rng = np.random.default_rng(action_seed)
    actions = jnp.asarray(rng.integers(0, 7, size=n), dtype=jnp.int32)
    final, (obs, rew, term, lines) = _ROLLOUT(state, actions)
    return final, np.asarray(obs), np.asarray(rew), np.asarray(term), np.asarray(lines)


def test_same_seed_same_trajectory():
    a = _traj(123, 9, 150)
    b = _traj(123, 9, 150)
    assert np.array_equal(a[1], b[1])
    assert np.array_equal(np.asarray(a[0].board), np.asarray(b[0].board))


def test_game_over_freezes_state():
    _, state, _ = fn_env.jit_reset(CFG)(jax.random.PRNGKey(0))
    state = state.replace(game_over=jnp.bool_(True))
    new_state, obs, reward, term, info = fn_env.jit_step(CFG)(state, jnp.int32(6))
    assert bool(term)
    assert float(reward) == 0.0
    assert int(info["lines_cleared"]) == 0
    assert np.array_equal(np.asarray(new_state.board), np.asarray(state.board))
    assert np.array_equal(np.asarray(new_state.rng_key), np.asarray(state.rng_key))


def test_score_monotone_and_reaches_game_over():
    """Random play: rewards never negative; game ends within 5k steps
    (ref pattern: tests/test_functional/test_integration.py:20-43)."""
    final, obs, rew, term, lines = _traj(3, 3, 5000)
    assert (rew >= 0).all()
    assert term[-1], "random play should end within 5k steps"
    # score is the running reward sum
    assert float(final.score) == rew.sum()


def test_vmap_step_equals_python_loop():
    B, T = 8, 20
    keys = jax.random.split(jax.random.PRNGKey(17), B)
    _, states, _ = fn_env.batched_reset(keys, config=CFG)
    rng = np.random.default_rng(17)
    acts = jnp.asarray(rng.integers(0, 7, size=(T, B)), dtype=jnp.int32)

    vfinal, (vobs, vrew, vterm, _) = _ROLLOUT(states, acts)

    for b in range(B):
        s = jax.tree.map(lambda x: x[b], states)
        sfinal, (sobs, srew, sterm, _) = _ROLLOUT(s, acts[:, b])
        assert np.array_equal(np.asarray(sobs), np.asarray(vobs[:, b]))
        assert np.array_equal(np.asarray(srew), np.asarray(vrew[:, b]))
        assert np.array_equal(np.asarray(sfinal.board), np.asarray(vfinal.board[b]))


def test_batched_reset_shapes_and_key_identity():
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    _, states, obs = fn_env.batched_reset(keys, config=CFG)
    assert states.board.shape == (B, CFG.padded_height, CFG.padded_width)
    assert obs.shape == (B, CFG.height, CFG.width)
    # identical keys -> identical states
    same = jnp.stack([keys[0], keys[0]])
    _, s2, o2 = fn_env.batched_reset(same, config=CFG)
    assert np.array_equal(np.asarray(o2[0]), np.asarray(o2[1]))
    assert np.array_equal(np.asarray(s2.queue[0]), np.asarray(s2.queue[1]))


def test_observation_active_piece_is_minus_one():
    _, state, obs = fn_env.jit_reset(CFG)(jax.random.PRNGKey(21))
    obs = np.asarray(obs)
    assert obs.shape == (CFG.height, CFG.width)
    assert obs.min() == -1  # active piece stamped as -1
    assert (obs == -1).sum() == 4  # exactly four piece cells
    assert obs.max() <= 1
