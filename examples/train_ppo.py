"""PPO on the flagship engine — envs, rollout and learner all on device.

Counterpart of the reference's CleanRL PPO example (ref: examples/train_ppo.py)
with the host loop reduced to: call the jitted train step, log metrics.
The reference steps 8 host envs; here thousands of envs run in lockstep on
the chip, so one iteration is rollout_len * n_envs env steps.

Learning signals: ``reward/step`` (alife + line clears) and
``steps/episode`` (rollout steps per finished episode — surviving longer)
climbing over iterations; recorded as JSONL with ``--log-json``.
"""
import argparse
import functools
import json
import os
import time

import jax

from tetris_gymnasium_tpu.config import EngineConfig, RewardsMapping
from tetris_gymnasium_tpu.rl import evaluate, ppo
from tetris_gymnasium_tpu.utils.tracking import Tracker
from tetris_gymnasium_tpu.models.networks import ActorCriticCNN


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=2048)
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument(
        "--chunk", type=int, default=1,
        help="iterations per device call (lax.scan): >1 removes the "
        "per-iteration host sync from the hot loop (~2.5x on a "
        "tunnel-attached chip); logging granularity becomes the chunk",
    )
    p.add_argument("--rollout-len", type=int, default=128)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument(
        "--anneal",
        action="store_true",
        help="linearly decay the learning rate to 0 and ent-coef to "
        "--ent-coef-final over the run (CleanRL --anneal-lr analog)",
    )
    p.add_argument("--ent-coef-final", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--gamma", type=float, default=0.999)
    p.add_argument("--update-epochs", type=int, default=6)
    p.add_argument("--n-minibatches", type=int, default=8)
    p.add_argument(
        "--alife", type=float, default=1.0,
        help="RewardsMapping.alife — per-commit survival reward "
        "(ref: mappings/rewards.py:12)",
    )
    p.add_argument(
        "--game-over-reward", type=float, default=0.0,
        help="RewardsMapping.game_over — terminal reward "
        "(ref: mappings/rewards.py:14)",
    )
    p.add_argument("--eval-max-steps", type=int, default=2000)
    p.add_argument(
        "--net",
        choices=("default", "fullres"),
        default="default",
        help="actor-critic trunk: default (strided 32-64-128) or fullres "
        "(stride-1 convs, no downsampling — placement precision)",
    )
    p.add_argument(
        "--obs",
        choices=("board", "rgb84"),
        default="board",
        help="observation: native board, or the reference PPO workload's "
        "exact chain RGB->resize(84x84)->grayscale fused on device "
        "(ref: train_ppo.py:92-110; forces flagship engine + Atari agent)",
    )
    p.add_argument(
        "--frame-stack", type=int, default=1,
        help="K: [B,K,H,W] motion window (reference FrameStack(4), "
        "ref: train_ppo.py:110)",
    )
    p.add_argument(
        "--save-params", type=str, default=None,
        help="save final actor-critic params here (utils.checkpoint)",
    )
    p.add_argument(
        "--init-params", type=str, default=None,
        help="warm-start from a saved checkpoint (fresh optimizer/envs): "
        "fine-tune or extend a previous run",
    )
    p.add_argument(
        "--impl",
        choices=("flagship", "turbo"),
        default="turbo",
        help="rollout engine: turbo (bit-packed batch-minor, fastest) or flagship",
    )
    p.add_argument(
        "--eval-every",
        type=int,
        default=0,
        help="iterations between greedy policy evals (0 = off)",
    )
    p.add_argument("--eval-episodes", type=int, default=256)
    p.add_argument("--wandb", action="store_true", help="mirror the JSONL records to Weights & Biases (no-op if wandb is not installed)")
    p.add_argument("--wandb-project", type=str, default="tetris-gymnasium-tpu")
    p.add_argument("--run-name", type=str, default=None)
    p.add_argument(
        "--video-every",
        type=int,
        default=0,
        help="iterations between greedy-episode GIF captures (0 = off)",
    )
    p.add_argument("--log-json", type=str, default=None, help="append JSONL here")
    args = p.parse_args()

    if args.chunk > 1:
        # silent desync traps: a non-divisible chunk changes how many
        # iterations actually run (breaking the --anneal schedules), and a
        # non-multiple eval/video cadence would simply never fire
        if args.iterations % args.chunk:
            p.error(f"--iterations {args.iterations} must be a multiple of "
                    f"--chunk {args.chunk}")
        for name in ("eval_every", "video_every"):
            v = getattr(args, name)
            if v and v % args.chunk:
                p.error(f"--{name.replace('_', '-')} {v} must be a multiple "
                        f"of --chunk {args.chunk}")

    env_config = EngineConfig(auto_reset=True)
    ppo_cfg = ppo.PPOConfig(
        rollout_len=args.rollout_len,
        ent_coef=args.ent_coef,
        ent_coef_final=args.ent_coef_final,
        learning_rate=args.lr,
        gamma=args.gamma,
        update_epochs=args.update_epochs,
        n_minibatches=args.n_minibatches,
        total_iterations=args.iterations if args.anneal else 0,
        frame_stack=args.frame_stack,
    )
    rewards = RewardsMapping(alife=args.alife, game_over=args.game_over_reward)
    if args.obs == "rgb84":
        from tetris_gymnasium_tpu.models import AtariActorCritic

        if args.impl != "flagship":
            print("obs=rgb84 needs id boards; switching --impl to flagship")
            args.impl = "flagship"
        net = AtariActorCritic()
    elif args.net == "fullres":
        net = ActorCriticCNN(strides=((1, 1), (1, 1), (1, 1)))
    else:
        net = ActorCriticCNN()

    # jit the init: eagerly it dispatches hundreds of tiny ops, which is
    # painfully slow on remote-attached accelerators
    ts = jax.jit(
        functools.partial(
            ppo.init_train_state,
            n_envs=args.n_envs,
            env_config=env_config,
            ppo=ppo_cfg,
            net=net,
            impl=args.impl,
            obs=args.obs,
        )
    )(jax.random.PRNGKey(args.seed))
    if args.init_params:
        from tetris_gymnasium_tpu.utils import checkpoint

        restored = checkpoint.restore(args.init_params, jax.device_get(ts.params))
        ts = ts.replace(params=jax.device_put(restored))
        print(f"warm-started params from {args.init_params}", flush=True)
    one_step = ppo.make_train_step(
        env_config, ppo_cfg, net, impl=args.impl, rewards=rewards, obs=args.obs
    )

    def chunk_step(ts):
        if args.chunk == 1:
            return one_step(ts)
        ts, ms = jax.lax.scan(
            lambda c, _: one_step(c), ts, None, length=args.chunk
        )
        # last iteration's losses, chunk-mean reward/episodes
        m = jax.tree.map(lambda x: x[-1], ms)
        m["mean_reward"] = ms["mean_reward"].mean()
        m["episodes_done"] = ms["episodes_done"].sum()
        return ts, m

    train_step = jax.jit(chunk_step, donate_argnums=0)

    log_f = None
    if args.log_json:
        os.makedirs(os.path.dirname(args.log_json) or ".", exist_ok=True)
        log_f = open(args.log_json, "a")
    tracker = Tracker(args.wandb, args.wandb_project, args.run_name, vars(args))

    eval_fn = jax.jit(
        lambda params, key: evaluate.evaluate_policy(
            evaluate.greedy_logits(net, params),
            args.eval_episodes,
            env_config,
            key,
            impl=args.impl,
            max_steps=args.eval_max_steps,
            frame_stack=args.frame_stack,
            obs=args.obs,
        )
    )

    steps_per_iter = args.n_envs * ppo_cfg.rollout_len
    t0 = time.perf_counter()
    n_calls = max(args.iterations // args.chunk, 1)
    for ci in range(1, n_calls + 1):
        ts, metrics = train_step(ts)
        it = ci * args.chunk
        if args.chunk > 1 or it % 5 == 0 or it == 1:
            m = jax.device_get(metrics)
            episodes = max(float(m["episodes_done"]), 1.0)
            window = steps_per_iter * args.chunk
            rec = {
                "iteration": it,
                "env_steps": steps_per_iter * it,
                "sps": round(steps_per_iter * it / (time.perf_counter() - t0)),
                "reward_per_step": round(float(m["mean_reward"]), 4),
                "steps_per_episode": round(window / episodes, 2),
                "pg_loss": round(float(m["pg_loss"]), 5),
                "v_loss": round(float(m["v_loss"]), 5),
                "entropy": round(float(m["entropy"]), 4),
            }
            if args.eval_every and it % args.eval_every == 0:
                ev = jax.device_get(eval_fn(ts.params, jax.random.PRNGKey(1000 + it)))
                rec.update(
                    eval_return=round(float(ev["return_mean"]), 3),
                    eval_length=round(float(ev["length_mean"]), 2),
                    eval_lines=round(float(ev["lines_mean"]), 4),
                    eval_episodes=int(ev["episodes_completed"]),
                )
            print(json.dumps(rec), flush=True)
            tracker.log(rec, it)
            if log_f:
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
        if args.video_every and it % args.video_every == 0 and args.obs != "rgb84":
            from tetris_gymnasium_tpu.utils import video

            base = os.path.splitext(args.log_json)[0] if args.log_json else "results/ppo"
            path = video.record_training_video(
                net, ts.params, f"{base}_it{it}.gif", env_config, seed=args.seed + it
            )
            print(f"recorded greedy episode -> {path}", flush=True)
            tracker.log_video(path, it)
    if args.save_params:
        from tetris_gymnasium_tpu.utils import checkpoint

        checkpoint.save(args.save_params, jax.device_get(ts.params))
        print(f"saved params to {args.save_params}", flush=True)
    if log_f:
        log_f.close()
    tracker.finish()


if __name__ == "__main__":
    main()
