"""Multi-host launcher for pod-slice training runs.

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
--process-id explicitly.
"""
from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=65536, help="global env count")
    p.add_argument("--horizon", type=int, default=256)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()

    import os

    import jax

    from tetris_gymnasium_tpu.parallel import mesh as pmesh

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

    import jax.numpy as jnp  # noqa: F401  (after distributed init)

    from tetris_gymnasium_tpu.config import EngineConfig

    config = EngineConfig(auto_reset=True)
    m = pmesh.env_mesh()  # all global devices
    n_dev = len(jax.devices())
    if jax.process_index() == 0:
        print(f"mesh: {n_dev} devices x {jax.process_count()} processes")

    states, _ = pmesh.sharded_reset(
        jax.random.PRNGKey(0), args.n_envs, config, m, obs="board"
    )
    # warm-up compile
    states, tot_r, tot_d = pmesh.sharded_random_rollout(
        states, jax.random.PRNGKey(1), config, m, args.horizon
    )
    jax.block_until_ready(tot_d)

    t0 = time.perf_counter()
    for i in range(args.repeats):
        states, tot_r, tot_d = pmesh.sharded_random_rollout(
            states, jax.random.PRNGKey(2 + i), config, m, args.horizon
        )
    jax.block_until_ready(tot_d)
    dt = time.perf_counter() - t0

    if jax.process_index() == 0:
        steps = args.n_envs * args.horizon * args.repeats
        print(
            f"{steps / dt:.3e} env-steps/s global "
            f"({steps / dt / n_dev:.3e} per chip), "
            f"sum reward {float(tot_r):.0f}, episodes {int(tot_d)}"
        )


if __name__ == "__main__":
    main()
