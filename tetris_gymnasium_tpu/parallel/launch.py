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
    args = p.parse_args()

    import os

    import jax

    if args.backend == "cpu":
        # Running under ``python -m`` the package import has ALREADY
        # initialized a backend (the device piece tables are built at import),
        # so jax_num_cpu_devices may be frozen by now.  The authoritative
        # path is env vars at process spawn (JAX_PLATFORMS=cpu,
        # JAX_NUM_CPU_DEVICES=K, JAX_CPU_COLLECTIVES_IMPLEMENTATION=gloo,
        # as tests/test_multihost.py does); these updates cover direct
        # script invocation and otherwise just VERIFY the runtime matches.
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

    metrics = run(m, config, args.n_envs, args.horizon, args.repeats)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)
    if jax.process_index() == 0:
        sps = metrics["steps_per_sec"]
        print(
            f"{sps:.3e} env-steps/s global ({sps / n_dev:.3e} per chip), "
            f"sum reward {metrics['sum_reward']:.0f}, "
            f"episodes {metrics['sum_done']}"
        )


if __name__ == "__main__":
    main()
