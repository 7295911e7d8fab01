"""DQN + CNN on the flagship engine — replay and learner on device.

Counterpart of the reference's CleanRL DQN example (ref: examples/train_cnn.py).
The reference pipes an 84x84x4 resized RGB stack through SB3's host replay;
here the net consumes the native board observation and the replay buffer is
device-resident, so the host loop only launches jitted steps.
"""
import argparse
import time

import jax

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import QNetworkCNN
from tetris_gymnasium_tpu.rl import dqn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=1024)
    p.add_argument("--steps", type=int, default=2000, help="batched env steps")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    env_config = EngineConfig(auto_reset=True)
    cfg = dqn.DQNConfig()
    net = QNetworkCNN()

    ts = dqn.init_dqn_state(
        jax.random.PRNGKey(args.seed), args.n_envs, env_config, cfg, net
    )
    train_step = jax.jit(dqn.make_train_step(env_config, cfg, net), donate_argnums=0)

    t0 = time.perf_counter()
    for it in range(1, args.steps + 1):
        ts, metrics = train_step(ts)
        if it % 100 == 0 or it == 1:
            metrics = jax.device_get(metrics)
            sps = args.n_envs * it / (time.perf_counter() - t0)
            print(
                f"step {it:6d}  SPS {sps:12.0f}  eps {metrics['epsilon']:.3f}  "
                f"loss {metrics['loss']:.5f}  q {metrics['mean_q']:+.3f}  "
                f"episodes {metrics['episodes_done']:5.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
