"""Evaluate a saved Q-net checkpoint: N greedy episodes, one device program.

Counterpart of the reference's standalone model evaluation (the
``evaluate`` fn of its DQN example loads a state dict and plays episodes on
one host env, ref: examples/train_cnn.py:29-66).  Here the whole evaluation
is ``rl.evaluate.evaluate_q_checkpoint``: hundreds of fresh episodes step
in lockstep to termination on device and the episodic statistics come from
the engine's frozen-state accumulators.

    python examples/evaluate_checkpoint.py --checkpoint params.npz \
        --episodes 512 [--frame-stack 4] [--width 10 --height 20]
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="params (utils.checkpoint)")
    p.add_argument("--episodes", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=2000)
    p.add_argument("--frame-stack", type=int, default=1, help="K the net trained with")
    p.add_argument("--width", type=int, default=10)
    p.add_argument("--height", type=int, default=20)
    p.add_argument(
        "--impl", choices=("flagship", "turbo"), default="turbo",
        help="rollout engine (board observations are value-equal on both)",
    )
    p.add_argument(
        "--net", choices=("qnet", "actor-critic"), default="qnet",
        help="checkpoint family: DQN Q-net or PPO actor-critic (greedy = "
        "argmax over policy logits)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.models import ActorCriticCNN, QNetworkCNN
    from tetris_gymnasium_tpu.rl import evaluate
    from tetris_gymnasium_tpu.utils import checkpoint

    config = EngineConfig(width=args.width, height=args.height)
    net = ActorCriticCNN() if args.net == "actor-critic" else QNetworkCNN()
    obs_shape = (
        (1, args.frame_stack, args.height, args.width)
        if args.frame_stack > 1
        else (1, args.height, args.width)
    )
    example = net.init(jax.random.PRNGKey(0), jnp.zeros(obs_shape, jnp.int8))
    params = checkpoint.restore(args.checkpoint, example)

    if args.net == "actor-critic":
        out = jax.jit(
            lambda p, key: evaluate.evaluate_policy(
                evaluate.greedy_logits(net, p), args.episodes, config, key,
                impl=args.impl, max_steps=args.max_steps,
                frame_stack=args.frame_stack,
            )
        )(params, jax.random.PRNGKey(args.seed))
        stats = {k: float(v) for k, v in jax.device_get(out).items()}
    else:
        stats = evaluate.evaluate_q_checkpoint(
            net, params, args.episodes, config,
            seed=args.seed, impl=args.impl,
            max_steps=args.max_steps, frame_stack=args.frame_stack,
        )
    print(json.dumps({k: round(v, 4) for k, v in stats.items()}))


if __name__ == "__main__":
    main()
