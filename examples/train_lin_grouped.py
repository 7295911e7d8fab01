"""DQN over grouped placement actions with feature observations.

Counterpart of the reference's grouped linear DQN example
(ref: examples/train_lin_grouped.py): gravity off, actions are
(column, rotation) placements, the Q-net scores each candidate placement's
feature vector.  All 40 placements of all envs are enumerated in one fused
device program per step.
"""
import argparse
import time

import jax

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import QMLP
from tetris_gymnasium_tpu.rl import grouped_dqn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=512)
    p.add_argument("--steps", type=int, default=5000, help="batched env steps")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    env_config = EngineConfig(gravity_enabled=False, auto_reset=True)
    cfg = grouped_dqn.GroupedDQNConfig()
    net = QMLP()

    ts = grouped_dqn.init_grouped_dqn_state(
        jax.random.PRNGKey(args.seed), args.n_envs, env_config, cfg, net
    )
    train_step = jax.jit(
        grouped_dqn.make_train_step(env_config, cfg, net), donate_argnums=0
    )

    t0 = time.perf_counter()
    lines_total = 0.0
    for it in range(1, args.steps + 1):
        ts, metrics = train_step(ts)
        if it % 100 == 0 or it == 1:
            metrics = jax.device_get(metrics)
            lines_total += float(metrics["lines_cleared"])
            sps = args.n_envs * it / (time.perf_counter() - t0)
            print(
                f"step {it:6d}  SPS {sps:10.0f}  eps {metrics['epsilon']:.3f}  "
                f"loss {metrics['loss']:.5f}  reward {metrics['mean_reward']:+.3f}  "
                f"lines(sampled) {lines_total:.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
