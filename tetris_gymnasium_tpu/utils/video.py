"""Episode video capture: roll out a policy, write an upscaled RGB episode.

The reference records training videos with Gymnasium's ``RecordVideo``
wrapper + moviepy (ref: examples/train_cnn.py:130-135); here the frames come
straight from the engine's fused RGB composition (``engine.render_rgb``,
board left / queue top-right / holder bottom-right) and are written with
imageio — GIF always works, MP4 when an ffmpeg backend is present.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine


def upscale(frame: np.ndarray, factor: int) -> np.ndarray:
    """Nearest-neighbour upscale, the reference's ``np.kron`` trick
    (ref: wrappers/observation.py:105-110)."""
    return np.kron(frame, np.ones((factor, factor, 1), dtype=frame.dtype))


def record_episode(
    policy_fn: Optional[Callable] = None,
    config: EngineConfig = EngineConfig(),
    seed: int = 0,
    max_steps: int = 500,
    upscale_factor: int = 10,
) -> np.ndarray:
    """Play one episode, return frames ``uint8[T, H*u, W*u, 3]``.

    ``policy_fn(obs_board int8[H, W], key) -> action`` defaults to uniform
    random.  The rollout is a host loop over the jitted single-env step (an
    episode is inherently sequential); rendering is jitted too.
    """
    step = engine.jit_step(config, obs="board")
    render = engine.jit_render_rgb(config)

    key = jax.random.PRNGKey(seed)
    state, obs = engine.jit_reset(config, obs="board")(
        jax.random.fold_in(key, 0)
    )
    if policy_fn is None:
        def policy_fn(obs, k):
            return jax.random.randint(k, (), 0, 8)

    frames = [upscale(np.asarray(render(state)), upscale_factor)]
    for t in range(max_steps):
        key, sub = jax.random.split(key)
        action = policy_fn(obs, sub)
        state, obs, _, done, _ = step(state, jnp.int32(action))
        frames.append(upscale(np.asarray(render(state)), upscale_factor))
        if bool(done):
            break
    return np.stack(frames)


def write_video(frames: np.ndarray, path: str, fps: int = 10) -> str:
    """Write frames to ``path`` (.gif always; .mp4 if ffmpeg is available).

    Returns the path actually written — falls back to ``.gif`` when the
    mp4 backend is missing, rather than failing.
    """
    import imageio

    try:
        imageio.mimsave(path, list(frames), fps=fps)
        return path
    except Exception:
        if path.endswith(".gif"):
            raise
        alt = path.rsplit(".", 1)[0] + ".gif"
        imageio.mimsave(alt, list(frames), fps=fps)
        return alt
