"""Batched policy-evaluation harness (rl/evaluate.py).

Checks the harness against hand-driven rollouts: the frozen-state episodic
accumulators it reads (score/steps/lines) must equal a manual loop's
per-episode sums, stats must be deterministic in the seed, and all three
policy flavors (Q-net, actor-critic logits, masked grouped Q) drive it.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import ActorCriticCNN, QMLP, QNetworkCNN
from tetris_gymnasium_tpu.parallel.mesh import batch_keys
from tetris_gymnasium_tpu.rl import evaluate
from tetris_gymnasium_tpu.rl.engines import env_fns

CFG = EngineConfig(width=6, height=8, auto_reset=False)
N = 32


def test_stats_match_hand_rollout():
    """Constant hard-drop policy: harness stats == a manual loop's sums."""
    act = lambda obs: jnp.full((obs.shape[0],), 5, jnp.int32)  # noqa: E731
    out = jax.jit(
        lambda key: evaluate.evaluate_policy(act, N, CFG, key, max_steps=200)
    )(jax.random.PRNGKey(0))

    # manual: same keys, same engine, accumulate per-env until first done
    init, step_b, _ = env_fns(CFG, "turbo")
    states = init(batch_keys(jax.random.PRNGKey(0), N))
    ret = np.zeros(N)
    length = np.zeros(N, int)
    lines = np.zeros(N, int)
    alive = np.ones(N, bool)
    for _ in range(200):
        states, _, r, done, info = step_b(states, jnp.full((N,), 5, jnp.int32))
        ret += np.asarray(r) * alive
        length += alive
        lines += np.asarray(info["lines_cleared"]) * alive
        alive &= ~np.asarray(done)
    assert not alive.any(), "hard-drop spam must finish every episode"

    assert int(out["episodes_completed"]) == N
    assert float(out["completed_frac"]) == 1.0
    np.testing.assert_allclose(float(out["return_mean"]), ret.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(out["return_min"]), ret.min(), rtol=1e-6)
    np.testing.assert_allclose(float(out["return_max"]), ret.max(), rtol=1e-6)
    np.testing.assert_allclose(float(out["length_mean"]), length.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(out["lines_mean"]), lines.mean(), rtol=1e-6)


def test_fully_truncated_eval_has_no_sentinels():
    """max_steps=1 finishes zero episodes: min/max must be 0, not ±2^30."""
    act = lambda obs: jnp.zeros((obs.shape[0],), jnp.int32)  # noqa: E731
    out = jax.jit(
        lambda key: evaluate.evaluate_policy(act, N, CFG, key, max_steps=1)
    )(jax.random.PRNGKey(0))
    assert int(out["episodes_completed"]) == 0
    assert float(out["return_min"]) == 0.0
    assert float(out["return_max"]) == 0.0
    assert float(out["return_mean"]) == 0.0


def test_q_policy_eval_and_determinism():
    net = QNetworkCNN()
    init, _, observe = env_fns(CFG, "turbo")
    obs = observe(init(batch_keys(jax.random.PRNGKey(1), 2)))
    params = net.init(jax.random.PRNGKey(2), obs)

    ev1 = evaluate.evaluate_q_checkpoint(net, params, N, CFG, seed=3, max_steps=400)
    ev2 = evaluate.evaluate_q_checkpoint(net, params, N, CFG, seed=3, max_steps=400)
    assert ev1 == ev2, "same seed must reproduce exactly"
    assert ev1["episodes_completed"] > 0
    assert ev1["length_mean"] > 0
    ev3 = evaluate.evaluate_q_checkpoint(net, params, N, CFG, seed=4, max_steps=400)
    assert ev3 != ev1  # different episodes


def test_truncation_is_reported():
    """A no-op policy under gravity=False never locks: all envs truncate."""
    cfg = CFG._replace(gravity_enabled=False)
    act = lambda obs: jnp.full((obs.shape[0],), 7, jnp.int32)  # noqa: E731  no_op
    out = jax.jit(
        lambda key: evaluate.evaluate_policy(act, N, cfg, key, max_steps=50)
    )(jax.random.PRNGKey(5))
    assert int(out["truncated"]) == N
    assert int(out["episodes_completed"]) == 0


def test_frame_stack_policy_eval():
    net = QNetworkCNN()
    stack = jnp.zeros((1, 4, CFG.height, CFG.width), jnp.int8)
    params = net.init(jax.random.PRNGKey(0), stack)
    ev = evaluate.evaluate_q_checkpoint(
        net, params, 16, CFG, seed=0, max_steps=300, frame_stack=4
    )
    assert ev["episodes_completed"] > 0


def test_logits_policy_eval():
    net = ActorCriticCNN()
    init, _, observe = env_fns(CFG, "turbo")
    obs = observe(init(batch_keys(jax.random.PRNGKey(1), 2)))
    params = net.init(jax.random.PRNGKey(2), obs)
    out = jax.jit(
        lambda key: evaluate.evaluate_policy(
            evaluate.greedy_logits(net, params), 16, CFG, key, max_steps=300
        )
    )(jax.random.PRNGKey(6))
    assert int(out["episodes_completed"]) > 0


def test_grouped_policy_eval():
    cfg = EngineConfig(width=6, height=8, gravity_enabled=False, auto_reset=False)
    net = QMLP()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, cfg.width + 3)))
    out = jax.jit(
        lambda key: evaluate.evaluate_grouped(
            evaluate.greedy_masked_q(net, params), 16, cfg, key, max_steps=200
        )
    )(jax.random.PRNGKey(7))
    assert int(out["episodes_completed"]) > 0
    assert float(out["length_mean"]) > 0


def test_eval_on_wide_board():
    """The eval harness runs on the multi-word wide-board path too."""
    cfg = EngineConfig(width=30, height=14, auto_reset=False)
    act = lambda obs: jnp.full((obs.shape[0],), 5, jnp.int32)  # noqa: E731
    out = jax.jit(
        lambda key: evaluate.evaluate_policy(act, 16, cfg, key, max_steps=200)
    )(jax.random.PRNGKey(8))
    assert int(out["episodes_completed"]) == 16
    assert float(out["length_mean"]) > 0
