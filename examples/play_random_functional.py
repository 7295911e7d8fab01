"""Random agent on the compat functional engine, ASCII-rendered.

Counterpart of the reference example (ref: examples/play_random_functional.py):
reset, then step random actions until game over, printing the board.
"""
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EnvConfig
from tetris_gymnasium_tpu.core import fn_env

CHARS = {0: ".", 1: "#", -1: "*"}


def render(obs) -> str:
    return "\n".join("".join(CHARS[int(c)] for c in row) for row in obs)


if __name__ == "__main__":
    config = EnvConfig(width=10, height=20, padding=4, queue_size=7)
    step = fn_env.jit_step(config)
    reset = fn_env.jit_reset(config)

    key = jax.random.PRNGKey(42)
    key, state, obs = reset(key)

    steps, t0 = 0, time.perf_counter()
    while not bool(state.game_over):
        key, sub = jax.random.split(key)
        action = jax.random.randint(sub, (), 0, 7)
        state, obs, reward, terminated, info = step(state, action)
        steps += 1
        if steps % 50 == 0:
            print(f"--- step {steps}, score {float(state.score):.0f} ---")
            print(render(obs))
    dt = time.perf_counter() - t0
    print(f"game over after {steps} steps, score {float(state.score):.0f}, "
          f"{steps / dt:.0f} steps/s (single env, host loop)")
    print(render(obs))
