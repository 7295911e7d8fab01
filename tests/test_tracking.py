"""Experiment tracking (optional wandb) and in-training video capture."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import QNetworkCNN
from tetris_gymnasium_tpu.utils import video
from tetris_gymnasium_tpu.utils.tracking import Tracker

CFG = EngineConfig(width=6, height=8)


def test_tracker_disabled_is_noop():
    t = Tracker(enabled=False)
    assert not t.active
    t.log({"a": 1.0}, step=0)
    t.log_video("nonexistent.gif", step=0)
    t.finish()


def test_tracker_degrades_without_wandb(monkeypatch, capsys):
    """--wandb on a machine without the package: one warning, then no-op."""
    monkeypatch.setitem(sys.modules, "wandb", None)  # forces ImportError
    t = Tracker(enabled=True)
    assert not t.active
    assert "wandb requested" in capsys.readouterr().err
    t.log({"a": 1.0}, step=0)  # must not raise
    t.finish()


def test_record_training_video_qnet(tmp_path):
    net = QNetworkCNN()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 6), jnp.int8))
    path = video.record_training_video(
        net, params, str(tmp_path / "ep.gif"), CFG, seed=1, max_steps=60
    )
    assert path.endswith(".gif")
    import imageio

    frames = imageio.mimread(path)
    assert len(frames) > 1
    assert frames[0].shape[-1] in (3, 4)


def test_record_training_video_frame_stack(tmp_path):
    """The capture path feeds the net the same [1, K, H, W] window it
    trained on (host-side deque, starts full of the first frame)."""
    net = QNetworkCNN()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 6), jnp.int8))
    path = video.record_training_video(
        net, params, str(tmp_path / "ep4.gif"), CFG, frame_stack=4, seed=2, max_steps=60
    )
    import imageio

    assert len(imageio.mimread(path)) > 1


def test_greedy_policy_fn_window_semantics():
    """The host window mirrors ops.framestack: starts full of frame 0,
    then rolls."""
    seen = []

    class Probe:
        def apply(self, params, x):
            seen.append(np.asarray(x[0]))
            return jnp.zeros((1, 8))

    policy = video.greedy_policy_fn(Probe(), None, frame_stack=3)
    f = [np.full((2, 2), i, np.int8) for i in range(3)]
    policy(jnp.asarray(f[0]), None)
    policy(jnp.asarray(f[1]), None)
    policy(jnp.asarray(f[2]), None)
    np.testing.assert_array_equal(seen[0], np.stack([f[0]] * 3))
    np.testing.assert_array_equal(seen[1], np.stack([f[0], f[0], f[1]]))
    np.testing.assert_array_equal(seen[2], np.stack([f[0], f[1], f[2]]))
