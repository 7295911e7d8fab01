"""PPO on the flagship engine — envs, rollout and learner all on device.

Counterpart of the reference's CleanRL PPO example (ref: examples/train_ppo.py)
with the host loop reduced to: call the jitted train step, log metrics.
The reference steps 8 host envs; here thousands of envs run in lockstep on
the chip, so one iteration is rollout_len * n_envs env steps.
"""
import argparse
import time

import jax

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.rl import ppo
from tetris_gymnasium_tpu.models.networks import ActorCriticCNN


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=2048)
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--rollout-len", type=int, default=128)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    env_config = EngineConfig(auto_reset=True)
    ppo_cfg = ppo.PPOConfig(rollout_len=args.rollout_len)
    net = ActorCriticCNN()

    ts = ppo.init_train_state(
        jax.random.PRNGKey(args.seed), args.n_envs, env_config, ppo_cfg, net
    )
    train_step = jax.jit(ppo.make_train_step(env_config, ppo_cfg, net), donate_argnums=0)

    steps_per_iter = args.n_envs * ppo_cfg.rollout_len
    t0 = time.perf_counter()
    for it in range(1, args.iterations + 1):
        ts, metrics = train_step(ts)
        if it % 10 == 0 or it == 1:
            metrics = jax.device_get(metrics)
            sps = steps_per_iter * it / (time.perf_counter() - t0)
            print(
                f"iter {it:4d}  SPS {sps:12.0f}  "
                f"reward/step {metrics['mean_reward']:8.4f}  "
                f"episodes {metrics['episodes_done']:6.0f}  "
                f"pg {metrics['pg_loss']:+.4f}  v {metrics['v_loss']:.4f}  "
                f"ent {metrics['entropy']:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
