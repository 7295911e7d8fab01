"""RL stack smoke + semantics tests (tiny shapes, CPU).

The reference repo has no tests for its examples; these cover the TPU
build's new first-class RL components (SURVEY.md §2.3): on-device replay,
PPO/DQN/grouped-DQN train steps compile and make finite progress.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import ActorCriticCNN, QMLP, QNetworkCNN
from tetris_gymnasium_tpu.rl import buffers, dqn, grouped_dqn, ppo


def test_replay_buffer_circular_semantics():
    example = {"x": jnp.zeros((4, 2), jnp.float32)}
    buf = buffers.create(example, capacity=8, batch=4)
    assert int(buf.size) == 0

    buf = buffers.add(buf, {"x": jnp.ones((4, 2)) * 1})
    buf = buffers.add(buf, {"x": jnp.ones((4, 2)) * 2})
    assert int(buf.size) == 8 and int(buf.pos) == 0
    # wrap-around overwrites the oldest block
    buf = buffers.add(buf, {"x": jnp.ones((4, 2)) * 3})
    assert int(buf.size) == 8 and int(buf.pos) == 4
    data = np.asarray(buf.data["x"])
    assert np.all(data[:4] == 3) and np.all(data[4:] == 2)

    batch = buffers.sample(buf, jax.random.PRNGKey(0), 16)
    assert batch["x"].shape == (16, 2)
    assert np.all(np.isin(np.asarray(batch["x"]), [2.0, 3.0]))


def test_buffer_capacity_must_divide():
    with pytest.raises(ValueError):
        buffers.create({"x": jnp.zeros((3,))}, capacity=10, batch=3)


def test_ppo_train_step_runs_and_updates():
    env_config = EngineConfig(auto_reset=True)
    cfg = ppo.PPOConfig(rollout_len=4, update_epochs=1, n_minibatches=2)
    net = ActorCriticCNN()
    ts = ppo.init_train_state(jax.random.PRNGKey(0), 8, env_config, cfg, net)
    step = jax.jit(ppo.make_train_step(env_config, cfg, net))

    ts2, metrics = step(ts)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # params changed
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        ts.params,
        ts2.params,
    )
    assert any(jax.tree.leaves(changed))
    # env advanced
    assert int(ts2.env_states.steps.sum()) > 0


def test_ppo_annealing_schedules():
    """total_iterations>0: ent_coef decays linearly, update_i counts."""
    env_config = EngineConfig(auto_reset=True)
    cfg = ppo.PPOConfig(
        rollout_len=4, update_epochs=1, n_minibatches=2,
        total_iterations=4, ent_coef=0.1, ent_coef_final=0.02,
    )
    net = ActorCriticCNN()
    ts = ppo.init_train_state(jax.random.PRNGKey(0), 8, env_config, cfg, net)
    step = jax.jit(ppo.make_train_step(env_config, cfg, net))
    coefs = []
    for _ in range(5):
        ts, metrics = step(ts)
        coefs.append(float(metrics["ent_coef"]))
    # linear 0.1 -> 0.02 over 4 iterations, clamped at the floor after
    np.testing.assert_allclose(coefs, [0.1, 0.08, 0.06, 0.04, 0.02], atol=1e-6)
    assert int(ts.update_i) == 5


def test_ppo_custom_rewards_mapping():
    """A custom RewardsMapping reaches the rollout engine (alife=0 => smaller
    per-commit rewards than the default alife=1)."""
    from tetris_gymnasium_tpu.config import RewardsMapping

    env_config = EngineConfig(auto_reset=True)
    cfg = ppo.PPOConfig(rollout_len=16, update_epochs=1, n_minibatches=2)
    net = ActorCriticCNN()
    ts = ppo.init_train_state(jax.random.PRNGKey(0), 8, env_config, cfg, net)
    step0 = jax.jit(ppo.make_train_step(env_config, cfg, net))
    stepz = jax.jit(
        ppo.make_train_step(env_config, cfg, net, rewards=RewardsMapping(alife=0.0))
    )
    _, m0 = step0(ts)
    _, mz = stepz(ts)
    assert float(mz["mean_reward"]) < float(m0["mean_reward"])


def test_ppo_turbo_impl_matches_flagship_rollout_stats():
    """impl="turbo" trains on the bit-packed engine: runs, updates, advances.

    Trajectory equivalence between the two engines is pinned in
    tests/test_turbo.py; here we check the PPO wiring — same TrainState
    surface, finite metrics, parameters move, env batch advances.
    """
    env_config = EngineConfig(auto_reset=True)
    cfg = ppo.PPOConfig(rollout_len=4, update_epochs=1, n_minibatches=2)
    net = ActorCriticCNN()
    ts = ppo.init_train_state(
        jax.random.PRNGKey(0), 8, env_config, cfg, net, impl="turbo"
    )
    step = jax.jit(ppo.make_train_step(env_config, cfg, net, impl="turbo"))

    ts2, metrics = step(ts)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        ts.params,
        ts2.params,
    )
    assert any(jax.tree.leaves(changed))
    # turbo state is batch-minor: steps is [B] and every env advanced 4 steps
    assert ts2.env_states.steps.shape == (8,)
    assert int(ts2.env_states.steps.min()) == 4

    # same per-env keys => the turbo rollout sees the flagship's game:
    # initial observations must match exactly between impls
    ts_flag = ppo.init_train_state(
        jax.random.PRNGKey(0), 8, env_config, cfg, net, impl="flagship"
    )
    np.testing.assert_array_equal(
        np.asarray(ts.last_obs), np.asarray(ts_flag.last_obs)
    )


def test_dqn_train_step_runs_and_learns_flag():
    env_config = EngineConfig(auto_reset=True)
    cfg = dqn.DQNConfig(
        buffer_size=64, batch_size=8, learning_starts=1, target_update_every=2
    )
    net = QNetworkCNN()
    ts = dqn.init_dqn_state(jax.random.PRNGKey(0), 8, env_config, cfg, net)
    step = jax.jit(dqn.make_train_step(env_config, cfg, net))

    # step 0: before learning_starts — params frozen
    ts1, m1 = step(ts)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        ts.params,
        ts1.params,
    )
    assert all(jax.tree.leaves(same))
    # step 1: learning — params move
    ts2, m2 = step(ts1)
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        ts1.params,
        ts2.params,
    )
    assert any(jax.tree.leaves(changed))
    assert np.isfinite(float(m2["loss"]))


def test_dqn_turbo_impl_runs_and_learns():
    """impl="turbo": DQN acts/replays/learns against the bit-packed engine."""
    env_config = EngineConfig(auto_reset=True)
    cfg = dqn.DQNConfig(
        buffer_size=64, batch_size=8, learning_starts=0, target_update_every=2
    )
    net = QNetworkCNN()
    ts = dqn.init_dqn_state(
        jax.random.PRNGKey(0), 8, env_config, cfg, net, impl="turbo"
    )
    step = jax.jit(dqn.make_train_step(env_config, cfg, net, impl="turbo"))
    ts1, m1 = step(ts)
    ts2, m2 = step(ts1)
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        ts1.params,
        ts2.params,
    )
    assert any(jax.tree.leaves(changed))
    assert np.isfinite(float(m2["loss"]))
    # turbo state is batch-minor: board rows are [H, B]
    assert ts2.env_states.rows.shape[-1] == 8
    assert ts2.obs.shape == ts.obs.shape


def test_grouped_dqn_train_step_respects_mask():
    env_config = EngineConfig(gravity_enabled=False, auto_reset=True)
    cfg = grouped_dqn.GroupedDQNConfig(
        buffer_size=32, batch_size=8, learning_starts=0
    )
    net = QMLP()
    ts = grouped_dqn.init_grouped_dqn_state(
        jax.random.PRNGKey(0), 4, env_config, cfg, net
    )
    step = jax.jit(grouped_dqn.make_train_step(env_config, cfg, net))
    for _ in range(3):
        ts, metrics = step(ts)
    # with legality-masked exploration no action is ever illegal, so no env
    # sees the invalid_action penalty reward (-0.1)
    assert float(metrics["mean_reward"]) >= 0.0
    assert np.isfinite(float(metrics["loss"]))


def test_sample_with_next_links_successors_across_wraparound():
    """Single-copy replay: each sampled entry's successor is the SAME env one
    step later, the newest block is never sampled, and the link holds after
    the circular buffer wraps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tetris_gymnasium_tpu.rl import buffers

    batch, capacity = 4, 16
    example = {"obs": jnp.zeros((batch, 3), jnp.int32), "t": jnp.zeros((batch,), jnp.int32)}
    buf = buffers.create(example, capacity, batch)

    # write 7 blocks (wraps after 4): obs encodes (timestep, env)
    for t in range(7):
        buf = buffers.add(
            buf,
            {
                "obs": jnp.stack([jnp.full((3,), 100 * t + e) for e in range(batch)]),
                "t": jnp.full((batch,), t, jnp.int32),
            },
        )

    cur, nxt = jax.jit(
        lambda b, k: buffers.sample_with_next(b, k, 64, batch)
    )(buf, jax.random.PRNGKey(0))
    ts = np.asarray(cur["t"])
    # resident blocks are t=3..6; the newest (6) is excluded from sampling
    assert set(ts) <= {3, 4, 5}
    np.testing.assert_array_equal(np.asarray(nxt["t"]), ts + 1)
    # successor is the same env, one timestep later
    np.testing.assert_array_equal(
        np.asarray(nxt["obs"][:, 0]), np.asarray(cur["obs"][:, 0]) + 100
    )


def test_grouped_dqn_boards_mode_one_step():
    """Boards-mode grouped DQN (per-candidate board images -> CNN Q) wires
    end-to-end: one train step runs, shapes/finiteness hold."""
    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.models import QGroupedBoardsCNN
    from tetris_gymnasium_tpu.rl import grouped_dqn

    env_config = EngineConfig(width=6, height=8, gravity_enabled=False, auto_reset=True)
    cfg = grouped_dqn.GroupedDQNConfig(
        buffer_size=64, batch_size=8, learning_starts=0, exploration_steps=10
    )
    net = QGroupedBoardsCNN()
    ts = grouped_dqn.init_grouped_dqn_state(
        jax.random.PRNGKey(0), 8, env_config, cfg, net, mode="boards"
    )
    assert ts.obs.shape == (8, 24, 8, 6)
    step = jax.jit(grouped_dqn.make_train_step(env_config, cfg, net, mode="boards"))
    ts, m = step(ts)
    ts, m = step(ts)
    assert jnp.isfinite(m["loss"]).item()
    assert ts.obs.shape == (8, 24, 8, 6)


def test_dqn_rgb84_obs_train_step():
    """obs='rgb84': DQN trains on the reference chain's 84x84 grayscale
    frames (ref: train_cnn.py:127-147) — runs, stores uint8 frames, updates."""
    from tetris_gymnasium_tpu.models import AtariQNetwork

    env_config = EngineConfig(auto_reset=True)
    cfg = dqn.DQNConfig(
        buffer_size=64, batch_size=4, learning_starts=0, frame_stack=4
    )
    net = AtariQNetwork()
    ds = dqn.init_dqn_state(
        jax.random.PRNGKey(0), 8, env_config, cfg, net, obs="rgb84"
    )
    assert ds.buffer.data["obs"].dtype == jnp.uint8
    assert ds.buffer.data["obs"].shape[-2:] == (84, 84)
    assert ds.obs.shape == (8, 4, 84, 84)
    step = jax.jit(dqn.make_train_step(env_config, cfg, net, obs="rgb84"))
    ds1 = ds
    for _ in range(4):  # learning gates on step >= frame_stack
        ds1, _ = step(ds1)
    ds2, metrics = step(ds1)
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        ds1.params, ds2.params,
    )
    assert any(jax.tree.leaves(changed))


def test_rgb84_env_fns_guards():
    from tetris_gymnasium_tpu.rl.engines import env_fns

    with pytest.raises(ValueError, match="flagship"):
        env_fns(EngineConfig(), "turbo", obs="rgb84")
    with pytest.raises(ValueError, match="observation kind"):
        env_fns(EngineConfig(), "flagship", obs="nope")


def test_ppo_rgb84_frame_stack_train_step():
    """obs='rgb84' + frame_stack=4: the reference PPO workload's exact input
    pipeline (RGB->84x84->gray->FrameStack(4), ref train_ppo.py:92-110);
    runs, stacks flow through the rollout, params update."""
    from tetris_gymnasium_tpu.models import AtariActorCritic

    env_config = EngineConfig(auto_reset=True)
    cfg = ppo.PPOConfig(
        rollout_len=4, update_epochs=1, n_minibatches=2, frame_stack=4
    )
    net = AtariActorCritic()
    ts = ppo.init_train_state(
        jax.random.PRNGKey(0), 4, env_config, cfg, net, obs="rgb84"
    )
    assert ts.last_obs.shape == (4, 4, 84, 84) and ts.last_obs.dtype == jnp.uint8
    step = jax.jit(ppo.make_train_step(env_config, cfg, net, obs="rgb84"))
    ts2, metrics = step(ts)
    assert np.isfinite(float(metrics["pg_loss"]))
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        ts.params, ts2.params,
    )
    assert any(jax.tree.leaves(changed))
