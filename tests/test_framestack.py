"""Frame stacking: online window semantics and replay-side reconstruction.

The invariant that matters: for every transition in the buffer,
``buffers.sample_with_next_stacked`` must reproduce EXACTLY the stack the
online actor saw at that step (ops.framestack semantics — oldest-first,
fresh episodes repeat their first frame, Gymnasium FrameStack parity with
the reference workload's wrapper, ref: examples/train_cnn.py:127-147),
because the learner trains on the reconstruction while the actor acted on
the online window.  Frame values encode ``(t, env)`` so any mixup across
time, envs or episode boundaries is visible in the comparison.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import QNetworkCNN
from tetris_gymnasium_tpu.ops import framestack
from tetris_gymnasium_tpu.rl import buffers, dqn

K = 4


def test_init_repeats_first_obs():
    obs = jnp.arange(2 * 3 * 4, dtype=jnp.int8).reshape(2, 3, 4)
    st = framestack.init(obs, K)
    assert st.shape == (2, K, 3, 4)
    for j in range(K):
        np.testing.assert_array_equal(np.asarray(st[:, j]), np.asarray(obs))


def test_push_rolls_and_resets():
    b = 3
    obs0 = jnp.zeros((b, 2, 2), jnp.int8)
    st = framestack.init(obs0, K)
    done = jnp.zeros((b,), bool)
    for i in range(1, 4):
        st = framestack.push(st, jnp.full((b, 2, 2), i, jnp.int8), done)
    # oldest-first: [0, 1, 2, 3]
    np.testing.assert_array_equal(np.asarray(st[:, 0]), 0)
    np.testing.assert_array_equal(np.asarray(st[:, -1]), 3)
    # env 1 terminates: its window resets to the new obs repeated
    done = jnp.asarray([False, True, False])
    st = framestack.push(st, jnp.full((b, 2, 2), 9, jnp.int8), done)
    np.testing.assert_array_equal(np.asarray(st[1]), 9)
    np.testing.assert_array_equal(np.asarray(st[0, 0]), 1)
    np.testing.assert_array_equal(np.asarray(st[0, -1]), 9)


def _run_and_fill(T, B, capacity_blocks, seed):
    """Synthetic trajectory with irregular episode boundaries: fill a replay
    buffer while maintaining the online stack; return (buffer, stacks[t])."""
    rng = np.random.default_rng(seed)
    frames = np.zeros((T, B, 2, 3), np.int32)
    for t in range(T):
        frames[t] = (t * 100 + np.arange(B))[:, None, None]
    frames = jnp.asarray(frames)
    dones = jnp.asarray(rng.random((T, B)) < 0.15)

    buf = buffers.create(
        {"obs": frames[0], "done": dones[0]}, capacity_blocks * B, B
    )
    online = framestack.init(frames[0], K)
    online_stacks = [online]
    for t in range(T - 1):
        buf = buffers.add(buf, {"obs": frames[t], "done": dones[t]})
        online = framestack.push(online, frames[t + 1], dones[t])
        online_stacks.append(online)
    return buf, online_stacks


def _check_samples(buf, online_stacks, B, n_samples=512, key=7):
    cur, nxt = buffers.sample_with_next_stacked(
        buf, jax.random.PRNGKey(key), n_samples, B, K
    )
    cur_np, nxt_np = np.asarray(cur["obs"]), np.asarray(nxt["obs"])
    seen_t = set()
    for s in range(n_samples):
        newest = int(cur_np[s, -1].reshape(-1)[0])
        t, b = newest // 100, newest % 100
        seen_t.add(t)
        np.testing.assert_array_equal(
            cur_np[s], np.asarray(online_stacks[t][b]),
            err_msg=f"sample {s}: online stack mismatch (t={t}, env={b})",
        )
        np.testing.assert_array_equal(
            nxt_np[s], np.asarray(online_stacks[t + 1][b]),
            err_msg=f"sample {s}: next stack mismatch (t={t}, env={b})",
        )
    return seen_t


def test_reconstruction_matches_online_exactly():
    """No-wraparound buffer: every sampled stack equals the online one."""
    T, B = 40, 4
    buf, online_stacks = _run_and_fill(T, B, capacity_blocks=T, seed=0)
    seen_t = _check_samples(buf, online_stacks, B)
    # sampling covered early (repeat-first-frame) and late anchors
    assert min(seen_t) <= K and max(seen_t) >= T - 4
    assert len(seen_t) > 20


def test_reconstruction_survives_wraparound():
    """Small circular buffer wrapping several times: same invariant."""
    T, B = 60, 4
    buf, online_stacks = _run_and_fill(T, B, capacity_blocks=12, seed=3)
    seen_t = _check_samples(buf, online_stacks, B)
    # only the newest 12 blocks are resident; lookback exclusion leaves
    # anchors t in [T-13+K-1, T-2]
    assert min(seen_t) >= T - 13 and max(seen_t) <= T - 2
    assert len(seen_t) >= 8


def test_dqn_trains_with_frame_stack():
    """A K=4 DQN step runs end-to-end and updates parameters."""
    env_config = EngineConfig(width=6, height=8, auto_reset=True)
    cfg = dqn.DQNConfig(
        buffer_size=64 * 16, batch_size=32, learning_starts=8, frame_stack=K
    )
    net = QNetworkCNN()
    ts = dqn.init_dqn_state(jax.random.PRNGKey(0), 16, env_config, cfg, net)
    assert ts.obs.shape == (16, K, 8, 6)
    step = jax.jit(dqn.make_train_step(env_config, cfg, net))
    p0 = np.asarray(jax.tree.leaves(ts.params)[0]).copy()
    for _ in range(16):
        ts, metrics = step(ts)
    assert ts.obs.shape == (16, K, 8, 6)
    assert float(metrics["loss"]) >= 0
    assert not np.allclose(np.asarray(jax.tree.leaves(ts.params)[0]), p0)


def test_network_consumes_stack_as_channels():
    net = QNetworkCNN()
    stack = jnp.zeros((2, K, 20, 10), jnp.int8)
    params = net.init(jax.random.PRNGKey(0), stack)
    q = net.apply(params, stack)
    assert q.shape == (2, 8)
    # first conv kernel has K input channels (frames feed in as channels)
    kernel = params["params"]["BoardEncoder_0"]["Conv_0"]["kernel"]
    assert kernel.shape[-2] == K
