"""Headline benchmark: batched jit env-steps/s on one chip.

Measures the flagship engine's batched step throughput (the metric named in
BASELINE.json: "env-steps/s per chip (batched jit step)").  The whole rollout
is one XLA program: per-step random actions are drawn on-device and the host
is touched only for the final scalar, so the number is pure device throughput.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is reported
against the BASELINE.json north-star target of 50M env-steps/s per host.

Prints ONE JSON line:
    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 50e6}
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.parallel.mesh import batch_keys
from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache

NORTH_STAR = 50e6  # env-steps/s per host (BASELINE.json north_star)


def build_rollout(config: EngineConfig, horizon: int):
    """One donating XLA program: `horizon` random-policy steps over the batch."""

    def rollout(states, key):
        def one(carry, _):
            s, k, tot_r, tot_d = carry
            k, sub = jax.random.split(k)
            acts = jax.random.randint(sub, (s.board.shape[0],), 0, 8)
            s2, _, r, d, _ = jax.vmap(
                functools.partial(
                    engine.step, config=config, obs_fn=lambda st, c, p: ()
                )
            )(s, acts)
            # Accumulate stats in the carry (scalar adds, VMEM-resident) so
            # reward/done are provably computed without forcing per-step HBM
            # writes of stacked outputs.
            return (s2, k, tot_r + jnp.sum(r), tot_d + jnp.sum(d)), None

        (final, _, tot_r, tot_d), _ = jax.lax.scan(
            one, (states, key, jnp.float32(0), jnp.int32(0)), None, length=horizon
        )
        return final, tot_r, tot_d

    return jax.jit(rollout, donate_argnums=(0,))


def main():
    enable_persistent_cache()
    n_envs = int(os.environ.get("BENCH_ENVS", 16384))
    horizon = int(os.environ.get("BENCH_HORIZON", 256))
    repeats = int(os.environ.get("BENCH_REPEATS", 4))

    config = EngineConfig(auto_reset=True)
    keys = batch_keys(jax.random.PRNGKey(0), n_envs)
    states = jax.jit(jax.vmap(functools.partial(engine.init_state, config=config)))(
        keys
    )

    rollout = build_rollout(config, horizon)

    # Warm-up (compile + first run).  Fence with a value fetch, not
    # block_until_ready: through a remote-execution tunnel the latter can
    # return before compile/execution finish, leaking warm-up cost into the
    # timed window.
    states, tot_r, tot_d = rollout(states, jax.random.PRNGKey(1))
    int(tot_d)

    t0 = time.perf_counter()
    dones = 0
    for i in range(repeats):
        states, tot_r, tot_d = rollout(states, jax.random.PRNGKey(2 + i))
        dones += int(tot_d)
    elapsed = time.perf_counter() - t0
    assert dones > 0, "no episode ever terminated — the rollout is not playing"

    steps_per_sec = n_envs * horizon * repeats / elapsed
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(steps_per_sec),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / NORTH_STAR, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
