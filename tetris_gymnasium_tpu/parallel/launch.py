"""Multi-host launcher for pod-slice runs.

The reference is strictly single-process (SURVEY.md §2); this is the
TPU-native scale-out entry the new framework adds: each host runs the same
program, `jax.distributed.initialize` forms the global runtime, and the env
batch shards over *all* chips in the slice via the `("env",)` mesh — the
same user code as single-host, just a bigger `jax.devices()`.

Usage (on every host of the slice, e.g. via `gcloud compute tpus tpu-vm ssh
--worker=all`):

    python -m tetris_gymnasium_tpu.parallel.launch --n-envs 65536 --horizon 256

On TPU pods the coordinator address / process ids are auto-detected from the
TPU metadata; on CPU/GPU clusters pass --coordinator/--num-processes/
--process-id explicitly.  ``--backend cpu --local-devices K`` forms a
K-virtual-CPU-device process (Gloo cross-process collectives) — that is how
tests/test_multihost.py runs REAL multi-process clusters on one machine and
pins them bit-for-bit against single-process runs.
"""
from __future__ import annotations

import argparse
import json
import time


def run(
    mesh,
    config,
    n_envs: int,
    horizon: int,
    repeats: int,
    engine_kind: str = "engine",
) -> dict:
    """Reset + warm-up + timed rollouts on an existing mesh; returns metrics.

    The exact op sequence (reset key 0, warm-up rollout key 1, timed rollout
    keys 2..2+repeats) is fixed so a multi-process run is comparable
    bit-for-bit with a single-process run of the same arguments: per-env PRNG
    streams fold on the global env index (mesh.py), every reward is
    integer-valued (score deltas, core/engine.py), and the final-state
    checksum uses wraparound uint32 sums — all placement-invariant.
    """
    import jax

    from tetris_gymnasium_tpu.parallel import mesh as pmesh

    states, _ = pmesh.sharded_reset(
        jax.random.PRNGKey(0), n_envs, config, mesh, obs="board"
    )
    # warm-up compile
    states, tot_r, tot_d = pmesh.sharded_random_rollout(
        states, jax.random.PRNGKey(1), config, mesh, horizon, engine_kind
    )
    jax.block_until_ready(tot_d)

    t0 = time.perf_counter()
    sum_r, sum_d = float(tot_r), int(tot_d)
    for i in range(repeats):
        states, tot_r, tot_d = pmesh.sharded_random_rollout(
            states, jax.random.PRNGKey(2 + i), config, mesh, horizon, engine_kind
        )
        sum_r += float(tot_r)
        sum_d += int(tot_d)
    jax.block_until_ready(tot_d)
    dt = time.perf_counter() - t0

    return {
        "n_devices": len(jax.devices()),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "steps_per_sec": n_envs * horizon * repeats / dt,
        "sum_reward": sum_r,
        "sum_done": sum_d,
        "checksum": pmesh.state_checksum(states, mesh),
    }


def run_ppo(
    mesh,
    config,
    n_envs: int,
    iterations: int,
    rollout_len: int = 8,
    impl: str = "flagship",
) -> dict:
    """Sharded PPO training on an existing (possibly multi-host) mesh.

    BASELINE config 5's training side: env batch sharded ``P("env")`` over
    every chip of the slice, parameters/optimizer replicated, the gradient
    all-reduce inserted by XLA from the sharding annotations alone.  The
    exact op sequence is fixed, so a multi-process run is comparable with a
    single-process run: tests/test_multihost.py pins final env-state
    checksums bit-for-bit and losses to float tolerance.
    """
    import jax

    from tetris_gymnasium_tpu.parallel import mesh as pmesh
    from tetris_gymnasium_tpu.rl import ppo as rl_ppo

    pcfg = rl_ppo.PPOConfig(
        rollout_len=rollout_len, update_epochs=1, n_minibatches=2, shuffle_block=8
    )
    net = rl_ppo.ActorCriticCNN()
    ts0 = jax.eval_shape(
        lambda k: rl_ppo.init_train_state(
            k, n_envs=n_envs, env_config=config, ppo=pcfg, net=net, impl=impl
        ),
        jax.random.PRNGKey(0),
    )
    shardings = pmesh.train_state_shardings(mesh, ts0, impl)
    ts = jax.jit(
        lambda k: rl_ppo.init_train_state(
            k, n_envs=n_envs, env_config=config, ppo=pcfg, net=net, impl=impl
        ),
        out_shardings=shardings,
    )(jax.random.PRNGKey(0))
    train_step = jax.jit(
        rl_ppo.make_train_step(config, pcfg, net, impl=impl),
        in_shardings=(shardings,),
        out_shardings=(shardings, pmesh.replicated(mesh)),
        donate_argnums=(0,),
    )

    ts, metrics = train_step(ts)  # warm-up/compile
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    losses = [float(metrics["pg_loss"])]
    for _ in range(iterations - 1):
        ts, metrics = train_step(ts)
        losses.append(float(metrics["pg_loss"]))
    dt = time.perf_counter() - t0

    # the warm-up iteration is excluded from timing; with iterations == 1
    # no timed iteration ran, so report no throughput rather than garbage
    sps = n_envs * rollout_len * (iterations - 1) / dt if iterations > 1 else None

    return {
        "n_devices": len(jax.devices()),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "train_steps_per_sec": sps,
        "pg_losses": losses,
        "final_entropy": float(metrics["entropy"]),
        "env_checksum": pmesh.state_checksum(ts.env_states, mesh),
        "param_checksum": pmesh.state_checksum(ts.params, mesh),
    }


def run_dqn(
    mesh,
    config,
    n_envs: int,
    iterations: int,
    impl: str = "flagship",
) -> dict:
    """Sharded DQN training on an existing (possibly multi-host) mesh.

    Env batch sharded ``P("env")``, learner replicated, replay buffer
    REPLICATED (see ``mesh.dqn_state_shardings`` for the rationale).  The op
    sequence is fixed so a multi-process run is comparable with a
    single-process run: tests/test_multihost.py pins final env-state AND
    replay-buffer checksums bit-for-bit and losses to float tolerance.
    """
    import jax

    from tetris_gymnasium_tpu.models.networks import QNetworkCNN
    from tetris_gymnasium_tpu.parallel import mesh as pmesh
    from tetris_gymnasium_tpu.rl import dqn as rl_dqn

    cfg = rl_dqn.DQNConfig(
        buffer_size=n_envs * 8,
        batch_size=32,
        learning_starts=2,
        target_update_every=4,
        exploration_steps=max(iterations, 1),
    )
    net = QNetworkCNN()

    def init(k):
        return rl_dqn.init_dqn_state(k, n_envs, config, cfg, net, impl=impl)

    ts0 = jax.eval_shape(init, jax.random.PRNGKey(0))
    shardings = pmesh.dqn_state_shardings(mesh, ts0, impl)
    ts = jax.jit(init, out_shardings=shardings)(jax.random.PRNGKey(0))
    train_step = jax.jit(
        rl_dqn.make_train_step(config, cfg, net, impl=impl),
        in_shardings=(shardings,),
        out_shardings=(shardings, pmesh.replicated(mesh)),
        donate_argnums=(0,),
    )

    ts, metrics = train_step(ts)  # warm-up/compile
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    losses = [float(metrics["loss"])]
    for _ in range(iterations - 1):
        ts, metrics = train_step(ts)
        losses.append(float(metrics["loss"]))
    dt = time.perf_counter() - t0
    sps = n_envs * (iterations - 1) / dt if iterations > 1 else None

    return {
        "n_devices": len(jax.devices()),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "train_steps_per_sec": sps,
        "losses": losses,
        "mean_q": float(metrics["mean_q"]),
        "env_checksum": pmesh.state_checksum(ts.env_states, mesh),
        "buffer_checksum": pmesh.state_checksum(ts.buffer, mesh),
        "param_checksum": pmesh.state_checksum(ts.params, mesh),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=65536, help="global env count")
    p.add_argument("--horizon", type=int, default=256)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--backend",
        choices=["auto", "cpu"],
        default="auto",
        help="'cpu' forces virtual CPU devices + Gloo collectives (testing)",
    )
    p.add_argument(
        "--local-devices",
        type=int,
        default=None,
        help="with --backend cpu: virtual CPU device count per process",
    )
    p.add_argument("--out", type=str, default=None, help="write metrics JSON here")
    p.add_argument(
        "--train",
        choices=["none", "ppo", "dqn"],
        default="none",
        help="run sharded training (ppo: replicated learner + XLA gradient "
        "all-reduce; dqn: replicated learner + replicated replay) instead "
        "of the rollout bench",
    )
    p.add_argument("--train-iters", type=int, default=3)
    args = p.parse_args()

    import os

    import jax

    if args.backend == "cpu":
        # Package import is backend-clean (module constants are numpy, see
        # ops/rng.py), so these config updates normally succeed and ARE the
        # path tests/test_multihost.py relies on (it only sets
        # JAX_PLATFORMS=cpu at spawn).  The try/except below covers the one
        # escape hatch: if some sitecustomize already initialized a backend,
        # JAX_NUM_CPU_DEVICES must have been set at process spawn and we
        # verify the device count instead of updating it.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if args.local_devices:
            try:
                jax.config.update("jax_num_cpu_devices", args.local_devices)
            except RuntimeError:
                got = jax.local_device_count()
                if got != args.local_devices:
                    raise RuntimeError(
                        f"backend already initialized with {got} local devices; "
                        f"--local-devices {args.local_devices} requires "
                        "JAX_NUM_CPU_DEVICES to be set at process spawn"
                    )

    from tetris_gymnasium_tpu.parallel import mesh as pmesh
    from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache

    enable_persistent_cache()

    # Initialize the distributed runtime iff a multi-process context is
    # configured (explicit flags or pod/cluster env hints).  Inside that
    # context any bring-up failure PROPAGATES — a misconfigured pod slice
    # must die at startup, not silently run single-host.
    multiproc = args.coordinator is not None or any(
        os.environ.get(v)
        for v in (
            "JAX_COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
            "SLURM_JOB_ID",
        )
    )
    if multiproc:
        kwargs = {}
        if args.coordinator is not None:
            kwargs = dict(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        pmesh.initialize_distributed(**kwargs)
    else:
        print("single-process run (no coordinator configured)")

    from tetris_gymnasium_tpu.config import EngineConfig

    config = EngineConfig(auto_reset=True)
    m = pmesh.env_mesh()  # all global devices
    n_dev = len(jax.devices())
    if jax.process_index() == 0:
        print(f"mesh: {n_dev} devices x {jax.process_count()} processes")

    if args.train == "ppo":
        metrics = run_ppo(m, config, args.n_envs, args.train_iters)
    elif args.train == "dqn":
        metrics = run_dqn(m, config, args.n_envs, args.train_iters)
    else:
        metrics = run(m, config, args.n_envs, args.horizon, args.repeats)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)
    if jax.process_index() == 0:
        if args.train == "dqn":
            sps = metrics["train_steps_per_sec"]
            sps_txt = f"{sps:.3e}" if sps is not None else "n/a (1 iteration)"
            print(f"{sps_txt} trained env-steps/s, loss {metrics['losses'][-1]:.5f}")
        elif args.train == "ppo":
            sps = metrics["train_steps_per_sec"]
            sps_txt = f"{sps:.3e}" if sps is not None else "n/a (1 iteration)"
            print(
                f"{sps_txt} trained env-steps/s, "
                f"pg_loss {metrics['pg_losses'][-1]:.4f}"
            )
        else:
            sps = metrics["steps_per_sec"]
            print(
                f"{sps:.3e} env-steps/s global ({sps / n_dev:.3e} per chip), "
                f"sum reward {metrics['sum_reward']:.0f}, "
                f"episodes {metrics['sum_done']}"
            )


if __name__ == "__main__":
    main()
