"""Learning acceptance: committed curves + an opt-in live training run.

The reference's training examples are trusted CleanRL ports with published
behavior (ref: examples/train_lin_grouped.py:322-341 logs lines cleared);
here the evidence is first-class: the committed JSONL curves in ``results/``
(produced by the examples on one TPU chip; commands in README) are asserted
against the random baseline, and an opt-in live run
(``TETRIS_TPU_SLOW_TESTS=1``) retrains a small grouped DQN from scratch on
CPU and asserts the line-clear rate climbs.
"""
import json
import os

import pytest

RESULTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")


def _load(name):
    path = os.path.join(RESULTS, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_grouped_dqn_curve_beats_random():
    """Final line-clear rate >> the random-policy rate at the start
    (ref workload: examples/train_lin_grouped.py)."""
    recs = _load("grouped_dqn.jsonl")
    assert len(recs) >= 10
    random_rate = recs[0]["lines_per_step"]  # epsilon ~= 1: random policy
    final_rate = sum(r["lines_per_step"] for r in recs[-5:]) / 5
    assert final_rate > 0.05, f"final lines/step {final_rate} too low"
    assert final_rate > 20 * max(random_rate, 1e-6), (
        f"no learning: random {random_rate} -> final {final_rate}"
    )
    # reward climbs with it
    assert recs[-1]["mean_reward"] > recs[0]["mean_reward"] + 0.5


def test_dqn_curve_beats_random():
    """CNN DQN on the full 8-action engine: survival and reward/step climb
    well above the random-exploration start (ref workload:
    examples/train_cnn.py; curve produced by examples/train_cnn.py on chip)."""
    recs = _load("dqn.jsonl")
    assert len(recs) >= 10
    # epsilon ~= 1 at the start: random policy
    early_survival = min(r["steps_per_episode"] for r in recs[:3])
    final_survival = sum(r["steps_per_episode"] for r in recs[-5:]) / 5
    assert final_survival > 1.5 * early_survival, (
        f"no learning: survival {early_survival} -> {final_survival}"
    )
    assert recs[-1]["reward_per_step"] > 1.5 * recs[0]["reward_per_step"]
    assert recs[-1]["epsilon"] < 0.1  # schedule actually annealed


def test_dqn_frame_stack_curve_beats_random():
    """K=4 frame-stacked CNN DQN (the reference workload's FrameStack(4)
    recipe on device): same learning gates as the K=1 curve."""
    recs = _load("dqn_k4.jsonl")
    assert len(recs) >= 10
    early_survival = min(r["steps_per_episode"] for r in recs[:3])
    final_survival = sum(r["steps_per_episode"] for r in recs[-5:]) / 5
    assert final_survival > 1.5 * early_survival, (
        f"no learning: survival {early_survival} -> {final_survival}"
    )
    assert recs[-1]["reward_per_step"] > 1.5 * recs[0]["reward_per_step"]


def test_curves_carry_greedy_eval_stats():
    """The committed curves embed batched greedy-eval checkpoints
    (rl/evaluate.py via --eval-every): eval_return present and improving
    from the first eval to the last."""
    for name in ("dqn.jsonl", "dqn_k4.jsonl", "ppo.jsonl", "grouped_dqn.jsonl"):
        recs = [r for r in _load(name) if "eval_return" in r]
        assert len(recs) >= 2, f"{name}: no eval checkpoints recorded"
        assert recs[-1]["eval_return"] > recs[0]["eval_return"], (
            f"{name}: greedy eval did not improve "
            f"({recs[0]['eval_return']} -> {recs[-1]['eval_return']})"
        )
        assert recs[-1]["eval_episodes"] > 0


def test_ppo_curve_beats_random():
    """Survival (steps/episode) and reward/step climb well above the random
    policy (ref workload: examples/train_ppo.py)."""
    recs = _load("ppo.jsonl")
    assert len(recs) >= 10
    # iterations 2-3 are the (near-)random policy after autoreset churn
    early_survival = min(r["steps_per_episode"] for r in recs[1:4])
    final_survival = sum(r["steps_per_episode"] for r in recs[-5:]) / 5
    assert final_survival > 2 * early_survival
    assert recs[-1]["reward_per_step"] > 2 * recs[0]["reward_per_step"]


def test_grouped_dqn_learns_live_micro():
    """ALWAYS-ON learning gate (~15 s on CPU): train a tiny grouped DQN from
    scratch on a 6x8 board and assert the line-clear rate strictly exceeds
    the random-policy rate of the first chunks (epsilon ~= 1).  The committed
    curves above are the full-scale evidence; this catches learning-path
    regressions in CI (VERDICT r2 #8)."""
    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.models.networks import QMLP
    from tetris_gymnasium_tpu.rl import grouped_dqn

    env_config = EngineConfig(
        width=6, height=8, gravity_enabled=False, auto_reset=True
    )
    cfg = grouped_dqn.GroupedDQNConfig(
        buffer_size=4096, batch_size=128, exploration_steps=250,
        learning_starts=64, target_update_every=64,
    )
    net = QMLP()
    ts = grouped_dqn.init_grouped_dqn_state(
        jax.random.PRNGKey(0), 64, env_config, cfg, net
    )
    train_step = grouped_dqn.make_train_step(env_config, cfg, net)

    @jax.jit
    def chunk(ts):
        def one(c, _):
            c, m = train_step(c)
            return c, m["lines_cleared"]

        ts, lines = jax.lax.scan(one, ts, None, length=50)
        return ts, jnp.sum(lines)

    totals = []
    for _ in range(10):
        ts, lines = chunk(ts)
        totals.append(float(lines))
    random_rate = sum(totals[:3]) / 3  # epsilon ~= 1: random placements
    learned_rate = sum(totals[-3:]) / 3
    assert learned_rate > 3 * max(random_rate, 1.0), (
        f"no learning: random {random_rate} -> learned {learned_rate} "
        f"lines per 50-step chunk ({totals})"
    )


@pytest.mark.skipif(
    not os.environ.get("TETRIS_TPU_SLOW_TESTS"),
    reason="live training acceptance (set TETRIS_TPU_SLOW_TESTS=1; ~15 min on CPU)",
)
def test_grouped_dqn_learns_live():
    """Train a small grouped DQN from scratch; line clears must climb."""
    import functools

    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.models.networks import QMLP
    from tetris_gymnasium_tpu.rl import grouped_dqn

    env_config = EngineConfig(width=6, gravity_enabled=False, auto_reset=True)
    cfg = grouped_dqn.GroupedDQNConfig(
        buffer_size=8192, batch_size=128, exploration_steps=400,
        learning_starts=100, target_update_every=100,
    )
    net = QMLP()
    ts = grouped_dqn.init_grouped_dqn_state(
        jax.random.PRNGKey(0), 64, env_config, cfg, net
    )
    train_step = grouped_dqn.make_train_step(env_config, cfg, net)

    @jax.jit
    def chunk(ts):
        def one(c, _):
            c, m = train_step(c)
            return c, m["lines_cleared"]

        ts, lines = jax.lax.scan(one, ts, None, length=50)
        return ts, jnp.sum(lines)

    totals = []
    for _ in range(17):
        ts, lines = chunk(ts)
        totals.append(float(lines))
    early, late = sum(totals[:3]), sum(totals[-3:])
    assert late > 2 * max(early, 1.0), f"no learning: early {early}, late {late}"


@pytest.mark.skipif(
    not os.environ.get("TETRIS_TPU_SLOW_TESTS"),
    reason="boards-mode grouped DQN live training (~5 min on CPU)",
)
def test_grouped_dqn_boards_mode_learns_live():
    """Board-image grouped DQN (QGroupedBoardsCNN on turbo mode=\"boards\")
    learns from scratch: lines cleared climb far above the random rate.
    Observed on this machine: 20 -> 574 lines per 50-step chunk in 500
    steps (32 envs, 6x8 board)."""
    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.models import QGroupedBoardsCNN
    from tetris_gymnasium_tpu.rl import grouped_dqn

    env_config = EngineConfig(width=6, height=8, gravity_enabled=False, auto_reset=True)
    cfg = grouped_dqn.GroupedDQNConfig(
        buffer_size=2048, batch_size=64, exploration_steps=250,
        learning_starts=64, target_update_every=64,
    )
    net = QGroupedBoardsCNN()
    ts = grouped_dqn.init_grouped_dqn_state(
        jax.random.PRNGKey(0), 32, env_config, cfg, net, mode="boards"
    )
    train_step = grouped_dqn.make_train_step(env_config, cfg, net, mode="boards")

    @jax.jit
    def chunk(ts):
        def one(c, _):
            c, m = train_step(c)
            return c, m["lines_cleared"]

        ts, lines = jax.lax.scan(one, ts, None, length=50)
        return ts, jnp.sum(lines)

    totals = []
    for _ in range(10):
        ts, lines = chunk(ts)
        totals.append(float(lines))
    assert sum(totals[-3:]) > 3 * max(sum(totals[:3]), 1.0), totals


def test_ppo_lines_centerpiece_at_least_10_lines():
    """The round-5 centerpiece: a long annealed PPO run on the standard
    10x20 gravity-on board whose FINAL greedy eval clears >= 10
    lines/episode (round-4 review next #2; reference workload being beaten:
    examples/train_cnn.py, 20M steps, no published result)."""
    recs = [r for r in _load("ppo_lines.jsonl") if "eval_lines" in r]
    assert len(recs) >= 4, "centerpiece curve must carry eval checkpoints"
    final = recs[-1]
    assert final["eval_lines"] >= 10.0, (
        f"final greedy eval {final['eval_lines']} lines/episode < 10"
    )
    assert final["eval_episodes"] >= 256  # a real population, not a fluke
    # the curve must show learning, not a lucky endpoint (first eval lands
    # a few hundred iterations in, already off the random floor)
    assert recs[-1]["eval_lines"] > 2 * recs[0]["eval_lines"]


def test_dqn_rgb84_curve_learns():
    """DQN trained on the reference's EXACT preprocessing chain
    (RGB->84x84 resize->grayscale->FrameStack(4), fused on device —
    examples/train_cnn.py --obs rgb84): reward/step climbs and the greedy
    eval return improves across checkpoints."""
    recs = _load("dqn_rgb84.jsonl")
    assert len(recs) >= 10
    assert recs[-1]["reward_per_step"] > 1.5 * recs[0]["reward_per_step"]
    evs = [r for r in recs if "eval_return" in r]
    assert len(evs) >= 2
    assert evs[-1]["eval_return"] > 1.5 * evs[0]["eval_return"]
