"""Checkpoint/restore and config-plumbing tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.utils import checkpoint


def test_checkpoint_roundtrip_env_state(tmp_path):
    """{env-state pytree} checkpoints round-trip exactly (SURVEY.md §5)."""
    cfg = EngineConfig()
    state = engine.init_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state)
    restored = checkpoint.restore(path, jax.device_get(state))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_identically(tmp_path):
    """Restore-and-replay gives the same trajectory as never stopping."""
    cfg = EngineConfig(gravity_enabled=False)
    step = engine.jit_step(cfg, obs="board")
    s = engine.init_state(jax.random.PRNGKey(1), cfg)
    for a in (0, 1, 5, 3):
        s, *_ = step(s, jnp.int32(a))

    path = str(tmp_path / "ckpt")
    checkpoint.save(path, s)
    s2 = checkpoint.restore(path, jax.device_get(s))

    for a in (5, 5, 2, 4):
        s, *_ = step(s, jnp.int32(a))
        s2, *_ = step(s2, jnp.int32(a))
    assert np.array_equal(np.asarray(s.board), np.asarray(s2.board))
    assert float(s.score) == float(s2.score)


def test_uniform_randomizer_covers_all_pieces():
    """queue_kind='uniform' samples every piece id (no off-by-one; the
    compat engine keeps the reference bug, the native engine must not)."""
    cfg = EngineConfig(gravity_enabled=False, queue_kind="uniform")
    step = engine.jit_step(cfg, obs="board")
    s = engine.init_state(jax.random.PRNGKey(0), cfg)
    seen = {int(s.piece)}
    for _ in range(60):
        s, *_ = step(s, jnp.int32(5))  # hard drop -> new piece
        if bool(s.game_over):
            s = engine.init_state(jax.random.fold_in(s.key, 1), cfg)
        seen.add(int(s.piece))
    assert seen == set(range(7))


def test_record_episode_and_write_video(tmp_path):
    """One-command visual artifact: frames roll out, a GIF lands on disk and
    reads back with the right geometry (ref analog: RecordVideo,
    examples/train_cnn.py:130-135)."""
    import imageio
    import numpy as np

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.utils import video

    config = EngineConfig()
    frames = video.record_episode(
        config=config, seed=2, max_steps=40, upscale_factor=4
    )
    assert frames.dtype == np.uint8 and frames.ndim == 4 and frames.shape[3] == 3
    assert len(frames) >= 2
    # engine RGB frame is (padded H) x (padded W + side panel), upscaled 4x
    assert frames.shape[1] % 4 == 0 and frames.shape[2] % 4 == 0
    assert (frames[0] != frames[-1]).any(), "episode never changed the screen"

    out = video.write_video(frames, str(tmp_path / "ep.gif"), fps=8)
    back = imageio.mimread(out)
    assert len(back) == len(frames)


def test_docs_site_builds(tmp_path):
    """The docs build (docs/build.py) produces a complete navigable site
    from the markdown tree (ref analog: the Sphinx CI build the reference
    has and this repo's round-2 review flagged as missing)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "docs_build",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), "docs", "build.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    n = mod.build(str(tmp_path))
    assert n >= 20, f"only {n} pages built"
    index = (tmp_path / "index.html").read_text()
    assert "scale/multihost.html" in index and ".md" not in index.split("<main>")[1]
    page = (tmp_path / "scale" / "training_perf.html").read_text()
    assert 'href="../index.html"' in page and "<table>" in page
