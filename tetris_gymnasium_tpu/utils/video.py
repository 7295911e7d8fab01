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


def greedy_policy_fn(
    net,
    params,
    frame_stack: int = 1,
) -> Callable:
    """A ``record_episode`` policy that plays a trained net greedily.

    Supports actor-critics (``apply -> (logits, value)``) and Q-nets
    (``apply -> q``).  With ``frame_stack > 1`` a host-side window feeds the
    net the same ``[1, K, H, W]`` motion stack it trained on
    (:mod:`tetris_gymnasium_tpu.ops.framestack` semantics — the deque starts
    full of the first frame).
    """
    window: list = []

    def scores(obs_batch):
        out = net.apply(params, obs_batch)
        return out[0] if isinstance(out, tuple) else out

    def policy(obs, key):
        if frame_stack > 1:
            if not window:
                window.extend([obs] * frame_stack)
            else:
                window.append(obs)
                del window[0]
            obs_in = jnp.stack(window)[None]  # [1, K, H, W]
        else:
            obs_in = obs[None]
        return int(jnp.argmax(scores(obs_in), axis=-1)[0])

    return policy


def record_training_video(
    net,
    params,
    path: str,
    config: EngineConfig = EngineConfig(),
    frame_stack: int = 1,
    seed: int = 0,
    max_steps: int = 400,
) -> str:
    """One greedy episode of the current policy -> GIF/MP4 at ``path``.

    The periodic in-training capture the reference gets from ``RecordVideo``
    (ref: examples/train_cnn.py:130-135), reusing the engine's fused RGB
    renderer; returns the path actually written.
    """
    frames = record_episode(
        greedy_policy_fn(net, params, frame_stack),
        config=config,
        seed=seed,
        max_steps=max_steps,
    )
    return write_video(frames, path)


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
