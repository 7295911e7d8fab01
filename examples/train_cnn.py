"""DQN + CNN on the flagship engine — replay and learner on device.

Counterpart of the reference's CleanRL DQN example (ref: examples/train_cnn.py).
The reference pipes an 84x84x4 resized RGB stack through SB3's host replay;
here the net consumes the native board observation and the replay buffer is
device-resident, so the host loop only launches jitted scan chunks.

Learning signals: ``reward/step`` climbing and ``episodes/step`` (death
rate) falling; recorded as JSONL with ``--log-json``.
"""
import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.models.networks import QNetworkCNN
from tetris_gymnasium_tpu.rl import dqn, evaluate
from tetris_gymnasium_tpu.utils.tracking import Tracker


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=1024)
    p.add_argument("--steps", type=int, default=20_000, help="batched env steps")
    p.add_argument("--chunk", type=int, default=100, help="steps per device call")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--exploration-steps", type=int, default=6_000)
    p.add_argument("--learning-starts", type=int, default=500)
    p.add_argument(
        "--impl",
        choices=("flagship", "turbo"),
        default="turbo",
        help="rollout engine: turbo (bit-packed batch-minor, fastest) or flagship",
    )
    p.add_argument(
        "--frame-stack",
        type=int,
        default=1,
        help="K: feed the net a [B, K, H, W] motion window (the reference "
        "workload's FrameStack(4), ref: train_cnn.py:127-147; replay still "
        "stores single frames — stacks rebuild at sample time)",
    )
    p.add_argument(
        "--obs",
        choices=("board", "rgb84"),
        default="board",
        help="observation: the native board (fastest), or the reference "
        "workload's exact chain RGB->resize(84x84)->grayscale fused on "
        "device (ref: train_cnn.py:127-147; forces the flagship engine and "
        "the reference's Atari Q-net)",
    )
    p.add_argument(
        "--eval-every",
        type=int,
        default=0,
        help="batched steps between greedy policy evals (0 = off); episodic "
        "return/length/lines land in the JSONL (ref analog: the reference "
        "DQN eval loop, train_cnn.py:29-66)",
    )
    p.add_argument("--eval-episodes", type=int, default=256)
    p.add_argument("--wandb", action="store_true", help="mirror the JSONL records to Weights & Biases (no-op if wandb is not installed)")
    p.add_argument("--wandb-project", type=str, default="tetris-gymnasium-tpu")
    p.add_argument("--run-name", type=str, default=None)
    p.add_argument(
        "--video-every",
        type=int,
        default=0,
        help="batched steps between greedy-episode GIF captures (0 = off; "
        "ref analog: RecordVideo during training, train_cnn.py:130-135)",
    )
    p.add_argument("--log-json", type=str, default=None, help="append JSONL here")
    p.add_argument(
        "--save-params",
        type=str,
        default=None,
        help="save final Q-net params here (utils.checkpoint; ref analog: "
        "torch.save of the q_network state dict, train_cnn.py:361-363)",
    )
    args = p.parse_args()

    env_config = EngineConfig(auto_reset=True)
    cfg = dqn.DQNConfig(
        exploration_steps=args.exploration_steps,
        learning_starts=args.learning_starts,
        frame_stack=args.frame_stack,
    )
    if args.obs == "rgb84":
        from tetris_gymnasium_tpu.models import AtariQNetwork

        if args.impl != "flagship":
            print("obs=rgb84 needs id boards; switching --impl to flagship")
            args.impl = "flagship"
        net = AtariQNetwork()
    else:
        net = QNetworkCNN()

    # jit the init: eagerly it dispatches hundreds of tiny ops, which is
    # painfully slow on remote-attached accelerators
    ts = jax.jit(
        functools.partial(
            dqn.init_dqn_state,
            n_envs=args.n_envs,
            env_config=env_config,
            cfg=cfg,
            net=net,
            impl=args.impl,
            obs=args.obs,
        )
    )(jax.random.PRNGKey(args.seed))
    train_step = dqn.make_train_step(env_config, cfg, net, impl=args.impl, obs=args.obs)

    @jax.jit
    def train_chunk(ts):
        def one(c, _):
            c, m = train_step(c)
            return c, (m["mean_reward"], m["episodes_done"], m["loss"], m["epsilon"])

        ts, (rew, eps_done, loss, eps) = jax.lax.scan(one, ts, None, length=args.chunk)
        return ts, {
            "mean_reward": jnp.mean(rew),
            "episodes": jnp.sum(eps_done),
            "loss": loss[-1],
            "epsilon": eps[-1],
        }

    log_f = None
    if args.log_json:
        os.makedirs(os.path.dirname(args.log_json) or ".", exist_ok=True)
        log_f = open(args.log_json, "a")
    tracker = Tracker(args.wandb, args.wandb_project, args.run_name, vars(args))

    def capture_video(step_i):
        if args.obs == "rgb84":
            print("(--video-every is board-policy only; skipped for rgb84)")
            return
        from tetris_gymnasium_tpu.utils import video

        base = os.path.splitext(args.log_json)[0] if args.log_json else "results/dqn"
        path = video.record_training_video(
            net, ts.params, f"{base}_ep{step_i}.gif", env_config,
            frame_stack=args.frame_stack, seed=args.seed + step_i,
        )
        print(f"recorded greedy episode -> {path}", flush=True)
        tracker.log_video(path, step_i)

    def run_eval(params, seed):
        ev = evaluate.evaluate_q_checkpoint(
            net, params, args.eval_episodes, env_config,
            seed=seed, impl=args.impl, frame_stack=args.frame_stack,
            obs=args.obs,
        )
        return {
            "eval_return": round(ev["return_mean"], 3),
            "eval_length": round(ev["length_mean"], 2),
            "eval_lines": round(ev["lines_mean"], 4),
            "eval_episodes": int(ev["episodes_completed"]),
        }

    t0 = time.perf_counter()
    for it in range(args.steps // args.chunk):
        ts, m = train_chunk(ts)
        m = jax.device_get(m)
        step = (it + 1) * args.chunk
        env_steps = step * args.n_envs
        chunk_steps = args.chunk * args.n_envs
        rec = {
            "step": step,
            "env_steps": env_steps,
            "sps": round(env_steps / (time.perf_counter() - t0)),
            "reward_per_step": round(float(m["mean_reward"]), 4),
            "steps_per_episode": round(chunk_steps / max(float(m["episodes"]), 1.0), 2),
            "loss": round(float(m["loss"]), 5),
            "epsilon": round(float(m["epsilon"]), 4),
        }
        if args.eval_every and step % args.eval_every == 0:
            rec.update(run_eval(ts.params, seed=args.seed + it))
        print(json.dumps(rec), flush=True)
        tracker.log(rec, step)
        if args.video_every and step % args.video_every == 0:
            capture_video(step)
        if log_f:
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
    if log_f:
        log_f.close()
    tracker.finish()
    if args.save_params:
        from tetris_gymnasium_tpu.utils import checkpoint

        checkpoint.save(args.save_params, ts.params)
        print(f"saved params to {args.save_params}")


if __name__ == "__main__":
    main()
