"""Human keyboard play via an OpenCV window.

Counterpart of the reference example (ref: examples/play_interactive.py),
same key mapping (WASD + space hard drop, e/q rotate, c swap, r restart).
Requires a display; on a headless machine use play_random.py instead.
"""
import gymnasium as gym

import tetris_gymnasium_tpu.envs  # noqa: F401

KEY_TO_ACTION = {
    ord("a"): 0,  # left
    ord("d"): 1,  # right
    ord("s"): 2,  # down
    ord("e"): 3,  # rotate cw
    ord("q"): 4,  # rotate ccw
    ord(" "): 5,  # hard drop
    ord("c"): 6,  # swap
}

if __name__ == "__main__":
    import cv2

    env = gym.make("tetris_gymnasium_tpu/Tetris", render_mode="human")
    env.reset(seed=42)

    terminated = False
    while not terminated:
        env.render()
        key = cv2.waitKey(0)
        if key == ord("r"):
            env.reset()
            continue
        if key in (27, ord("x")):  # esc / x: quit
            break
        action = KEY_TO_ACTION.get(key)
        if action is None:
            continue
        _, reward, terminated, _, _ = env.step(action)
    print("Game Over!")
    env.close()
