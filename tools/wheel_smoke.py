"""Post-install smoke test for the built wheel.

Run against an INSTALLED tetris-gymnasium-tpu (not the repo tree): imports
the package, registers the Gymnasium env, plays a short game through the
public shell, and steps the batched functional engine.  Used by the CI
packaging job and the Dockerfile wheel stage — the check the reference gets
implicitly from Poetry publishing (ref: pyproject.toml:66-68).

    pip wheel . --no-deps -w dist && pip install dist/*.whl
    python tools/wheel_smoke.py
"""
import os
import sys


def main():
    import tetris_gymnasium_tpu

    pkg_dir = os.path.dirname(tetris_gymnasium_tpu.__file__)
    repo_pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tetris_gymnasium_tpu")
    if os.path.realpath(pkg_dir) == os.path.realpath(repo_pkg):
        print(f"ERROR: imported the repo tree ({pkg_dir}), not the installed wheel")
        return 1

    # OOP shell through the public Gymnasium API
    import gymnasium as gym

    import tetris_gymnasium_tpu.envs  # noqa: F401 — registration side effect

    env = gym.make("tetris_gymnasium_tpu/Tetris")
    obs, _ = env.reset(seed=0)
    assert sorted(obs.keys()) == ["active_tetromino_mask", "board", "holder", "queue"]
    steps = 0
    for _ in range(200):
        obs, reward, terminated, truncated, info = env.step(env.action_space.sample())
        steps += 1
        if terminated:
            break
    env.close()

    # batched functional engine
    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.core import turbo
    from tetris_gymnasium_tpu.parallel.mesh import batch_keys

    cfg = EngineConfig(auto_reset=True)
    states = turbo.init(batch_keys(jax.random.PRNGKey(0), 32), cfg)
    step = jax.jit(lambda s, a: turbo.step(s, a, config=cfg))
    for t in range(16):  # no-ops: gravity advances, no auto-reset on a fresh board
        states, _, r, d, _ = step(states, jnp.full((32,), 7, jnp.int32))
    assert int(states.steps.min()) == 16

    print(f"wheel smoke OK: shell game {steps} steps; 32-env turbo batch stepped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
