"""DQN over grouped placement actions with feature observations.

Counterpart of the reference's grouped linear DQN example
(ref: examples/train_lin_grouped.py): gravity off, actions are
(column, rotation) placements, the Q-net scores each candidate placement's
feature vector.  All 40 placements of all envs are enumerated in one fused
device program per step, and ``--chunk`` steps run as one ``lax.scan``
program per host round-trip.

Learning signal (ref: train_lin_grouped.py:322-341 logs lines cleared):
``lines/step`` is the per-env-step line-clear rate; it climbing well above
the random baseline is the acceptance criterion (tests/test_learning.py).
"""
import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import QMLP
from tetris_gymnasium_tpu.rl import evaluate, grouped_dqn
from tetris_gymnasium_tpu.utils.tracking import Tracker


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=512)
    p.add_argument("--steps", type=int, default=20_000, help="batched env steps")
    p.add_argument("--chunk", type=int, default=100, help="steps per device call")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--exploration-steps", type=int, default=5_000)
    p.add_argument("--learning-starts", type=int, default=500)
    p.add_argument(
        "--eval-every",
        type=int,
        default=0,
        help="batched steps between greedy policy evals (0 = off)",
    )
    p.add_argument("--eval-episodes", type=int, default=256)
    p.add_argument("--wandb", action="store_true", help="mirror the JSONL records to Weights & Biases (no-op if wandb is not installed)")
    p.add_argument("--wandb-project", type=str, default="tetris-gymnasium-tpu")
    p.add_argument("--run-name", type=str, default=None)
    p.add_argument("--log-json", type=str, default=None, help="append JSONL here")
    args = p.parse_args()

    env_config = EngineConfig(gravity_enabled=False, auto_reset=True)
    cfg = grouped_dqn.GroupedDQNConfig(
        exploration_steps=args.exploration_steps,
        learning_starts=args.learning_starts,
    )
    net = QMLP()

    ts = grouped_dqn.init_grouped_dqn_state(
        jax.random.PRNGKey(args.seed), args.n_envs, env_config, cfg, net
    )
    train_step = grouped_dqn.make_train_step(env_config, cfg, net)

    @jax.jit
    def train_chunk(ts):
        def one(c, _):
            c, m = train_step(c)
            return c, (m["lines_cleared"], m["mean_reward"], m["loss"], m["epsilon"])

        ts, (lines, rew, loss, eps) = jax.lax.scan(
            one, ts, None, length=args.chunk
        )
        return ts, {
            "lines": jnp.sum(lines),
            "mean_reward": jnp.mean(rew),
            "loss": loss[-1],
            "epsilon": eps[-1],
        }

    log_f = None
    if args.log_json:
        os.makedirs(os.path.dirname(args.log_json) or ".", exist_ok=True)
        log_f = open(args.log_json, "a")
    tracker = Tracker(args.wandb, args.wandb_project, args.run_name, vars(args))

    eval_fn = jax.jit(
        lambda params, key: evaluate.evaluate_grouped(
            evaluate.greedy_masked_q(net, params),
            args.eval_episodes,
            env_config,
            key,
        )
    )

    t0 = time.perf_counter()
    for it in range(args.steps // args.chunk):
        ts, m = train_chunk(ts)
        m = jax.device_get(m)
        step = (it + 1) * args.chunk
        env_steps = step * args.n_envs
        rec = {
            "step": step,
            "env_steps": env_steps,
            "sps": round(env_steps / (time.perf_counter() - t0)),
            "lines_per_step": round(float(m["lines"]) / (args.chunk * args.n_envs), 5),
            "mean_reward": round(float(m["mean_reward"]), 4),
            "loss": round(float(m["loss"]), 5),
            "epsilon": round(float(m["epsilon"]), 4),
        }
        if args.eval_every and step % args.eval_every == 0:
            ev = jax.device_get(eval_fn(ts.params, jax.random.PRNGKey(2000 + it)))
            rec.update(
                eval_return=round(float(ev["return_mean"]), 3),
                eval_length=round(float(ev["length_mean"]), 2),
                eval_lines=round(float(ev["lines_mean"]), 4),
                eval_episodes=int(ev["episodes_completed"]),
            )
        print(json.dumps(rec), flush=True)
        tracker.log(rec, step)
        if log_f:
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
    if log_f:
        log_f.close()
    tracker.finish()


if __name__ == "__main__":
    main()
