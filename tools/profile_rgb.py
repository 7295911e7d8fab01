"""Attribute the RGB pipeline bench numbers to their stages (round-4 next #8).

``rgb_actor_steps_per_sec`` (~3.4M at B=8192) sits ~5x below the plain board
actor feed (17.5M); round-4 notes suspected the vmapped flagship step
dominates after the one-hot compositing rewrite.  This script times, on the
real chip, each stage of the two RGB pipelines in isolation:

  flagship env step | observe_dict+compose (render_rgb) | 84x84 resize |
  grayscale | AtariQNetwork forward | QNetworkCNN forward

and the composed loops, so the published numbers decompose into measured
components (summary: docs/scale/training_perf.md).

Run: python tools/profile_rgb.py   (BENCH_ENVS env var, default 8192).
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.models import AtariQNetwork, QNetworkCNN
from tetris_gymnasium_tpu.ops import image
from tetris_gymnasium_tpu.ops import rng as orng
from tetris_gymnasium_tpu.parallel.mesh import batch_keys
from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache

B = int(os.environ.get("BENCH_ENVS", 8192))
L = 32
REPEATS = 3


def timed_loop(make_body, carry, fence):
    """Median-of-REPEATS time for a jitted L-scan of ``body``; µs/iteration."""

    def run(c):
        def one(c, _):
            return make_body(c), None

        c, _ = jax.lax.scan(one, c, None, length=L)
        return c

    run = jax.jit(run)
    carry = run(carry)
    fence(carry)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = run(carry)
        fence(out)
        times.append((time.perf_counter() - t0) / L * 1e6)
    return sorted(times)[len(times) // 2], carry


def main():
    enable_persistent_cache()
    cfg = EngineConfig(auto_reset=True)
    keys = batch_keys(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(functools.partial(engine.init_state, config=cfg)))(keys)
    render = jax.vmap(functools.partial(engine.render_rgb, config=cfg))
    step_b = jax.vmap(
        functools.partial(engine.step, config=cfg, obs_fn=lambda *_: ())
    )

    results = {}

    def fence_states(c):
        jax.block_until_ready(c)
        s = c[0] if isinstance(c, tuple) else c
        int(jnp.sum(s.steps if hasattr(s, "steps") else s))

    # 1. flagship env step alone (random actions from counter rng)
    k0 = jnp.tile(jnp.asarray([1, 2], jnp.uint32)[:, None], (1, B))

    def step_only(c):
        s, k = c
        k, a = orng.randint(k, 8)
        s2, _, _, _, _ = step_b(s, a)
        return (s2, k)

    results["flagship_step_us"], carry = timed_loop(step_only, (states, k0), fence_states)
    states = carry[0]

    # 2. render_rgb (observe_dict + compose) alone — accumulate to keep it live
    def render_only(c):
        s, acc = c
        rgb = render(s)
        return (s, acc + jnp.sum(rgb.astype(jnp.uint32)))

    def fence_acc(c):
        int(c[1])

    results["render_rgb_us"], _ = timed_loop(
        render_only, (states, jnp.uint32(0)), fence_acc
    )

    # 3. resize alone / 4. grayscale alone (on a fixed frame batch)
    rgb0 = render(states)

    def resize_only(c):
        rgb, acc = c
        big = image.resize_area_zoom(rgb, 84, 84)
        return (rgb, acc + jnp.sum(big[:, ::7, ::7, 0].astype(jnp.uint32)))

    results["resize_us"], _ = timed_loop(resize_only, (rgb0, jnp.uint32(0)), fence_acc)

    big0 = image.resize_area_zoom(rgb0, 84, 84)

    def gray_only(c):
        big, acc = c
        g = image.grayscale_u8(big)
        return (big, acc + jnp.sum(g[:, ::7, ::7].astype(jnp.uint32)))

    results["grayscale_us"], _ = timed_loop(gray_only, (big0, jnp.uint32(0)), fence_acc)

    # 5. net forwards on fixed inputs
    frames0 = image.grayscale_u8(big0)
    atari = AtariQNetwork()
    ap = atari.init(jax.random.PRNGKey(1), frames0[:2])

    def atari_fwd(c):
        f, acc = c
        q = atari.apply(ap, f)
        return (f, acc + jnp.sum(q).astype(jnp.uint32))

    results["atari_fwd_us"], _ = timed_loop(atari_fwd, (frames0, jnp.uint32(0)), fence_acc)

    board0 = jax.vmap(functools.partial(engine.observe_board, config=cfg))(states)
    qnet = QNetworkCNN()
    qp = qnet.init(jax.random.PRNGKey(2), board0[:2])

    def board_fwd(c):
        b, acc = c
        q = qnet.apply(qp, b)
        return (b, acc + jnp.sum(q).astype(jnp.uint32))

    results["board_fwd_us"], _ = timed_loop(board_fwd, (board0, jnp.uint32(0)), fence_acc)

    # 6. composed: step + render (the rgb_actor bench inner loop)
    def step_render(c):
        s, k, acc = c
        rgb = render(s)
        k, a = orng.randint(k, 8)
        s2, _, _, _, _ = step_b(s, a)
        return (s2, k, acc + jnp.sum(rgb.astype(jnp.uint32)))

    def fence3(c):
        int(c[2])

    results["step_plus_render_us"], _ = timed_loop(
        step_render, (states, k0, jnp.uint32(0)), fence3
    )

    # 7. composed: full rgb84 chain + atari fwd + step
    def full_chain(c):
        s, acc = c
        frames = image.preprocess_rgb84(render(s))
        q = atari.apply(ap, frames)
        a = jnp.argmax(q, axis=-1).astype(jnp.int32)
        s2, _, _, d, _ = step_b(s, a)
        return (s2, acc + jnp.sum(d).astype(jnp.uint32))

    results["full_rgb84_chain_us"], _ = timed_loop(
        full_chain, (states, jnp.uint32(0)), fence_acc
    )

    out = {
        "n_envs": B,
        "per_iteration_us": {k: round(v, 1) for k, v in results.items()},
        "steps_per_sec": {
            k.replace("_us", ""): round(B / (v / 1e6))
            for k, v in results.items()
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
