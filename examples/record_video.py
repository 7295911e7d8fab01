"""Record one episode of a policy as an upscaled GIF/MP4.

Counterpart of the reference's RecordVideo usage
(ref: examples/train_cnn.py:130-135): one command, one visual artifact.

    python examples/record_video.py --out episode.gif --seed 3

With ``--checkpoint`` it loads DQN params saved by ``utils.checkpoint`` and
plays greedily; otherwise the policy is uniform random.
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="episode.gif")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=300)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--upscale", type=int, default=10)
    p.add_argument("--checkpoint", default=None, help="params (utils.checkpoint)")
    p.add_argument(
        "--net", choices=("qnet", "actor-critic"), default="qnet",
        help="checkpoint family: DQN Q-net or PPO actor-critic",
    )
    p.add_argument(
        "--frame-stack", type=int, default=1,
        help="K the checkpoint trained with (--frame-stack K in train_cnn); "
        "builds the restore template with K input channels and drives the "
        "episode through the same [1, K, H, W] motion window",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tetris_gymnasium_tpu.config import EngineConfig
    from tetris_gymnasium_tpu.utils import video

    policy = None
    if args.checkpoint:
        from tetris_gymnasium_tpu.models import ActorCriticCNN, QNetworkCNN
        from tetris_gymnasium_tpu.utils import checkpoint

        net = ActorCriticCNN() if args.net == "actor-critic" else QNetworkCNN()
        k = args.frame_stack
        obs_shape = (1, 20, 10) if k <= 1 else (1, k, 20, 10)
        example = net.init(jax.random.PRNGKey(0), jnp.zeros(obs_shape, jnp.int8))
        params = checkpoint.restore(args.checkpoint, example)
        policy = video.greedy_policy_fn(net, params, frame_stack=k)

    frames = video.record_episode(
        policy_fn=policy,
        config=EngineConfig(),
        seed=args.seed,
        max_steps=args.max_steps,
        upscale_factor=args.upscale,
    )
    path = video.write_video(frames, args.out, fps=args.fps)
    print(f"wrote {len(frames)} frames to {path} ({frames.shape[1]}x{frames.shape[2]})")


if __name__ == "__main__":
    main()
