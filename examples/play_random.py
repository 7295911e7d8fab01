"""Random agent on the Gymnasium shell, ansi-rendered.

Counterpart of the reference example (ref: examples/play_random.py).
"""
import gymnasium as gym

import tetris_gymnasium_tpu.envs  # noqa: F401  (registers the env)

if __name__ == "__main__":
    env = gym.make("tetris_gymnasium_tpu/Tetris", render_mode="ansi")
    env.reset(seed=42)

    terminated = False
    steps = 0
    while not terminated:
        action = env.action_space.sample()
        observation, reward, terminated, truncated, info = env.step(action)
        steps += 1
        if steps % 50 == 0:
            print(env.render() + "\n")
    print(env.render())
    print(f"Game Over! ({steps} steps)")
