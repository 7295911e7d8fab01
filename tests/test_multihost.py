"""REAL multi-process (multi-"host") distributed runs, pinned bit-for-bit.

The reference is single-process by construction (SURVEY.md §2: no
torch.distributed / NCCL / MPI anywhere); multi-host scale-out is this
framework's own north star (BASELINE.md config 5).  These tests actually
execute `jax.distributed.initialize` across >=2 OS processes on this
machine — virtual CPU devices per process, Gloo cross-process collectives —
and assert:

  (a) cluster bring-up: global device count == n_processes x local_devices;
  (b) determinism: the global rollout of a multi-process cluster equals a
      single-process run of the exact same program BIT-FOR-BIT (final-state
      uint32 checksums, integer-valued reward sums, episode counts) — for
      2x4 and 4x2 process/device splits of the same 8-device mesh;
  (c) `parallel.launch` works end-to-end as the on-host entry point
      (subprocess, JSON metrics out).

Determinism holds by construction: per-env keys fold on the GLOBAL env
index inside the jitted program (parallel/mesh.py), threefry generation is
partitionable, and all reductions are wraparound-uint32 / integer-valued —
see parallel/launch.py:run.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.parallel import launch, mesh as pmesh

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_ENVS = 64
HORIZON = 16
REPEATS = 2
# The 2x4 / 4x2 shapes split the same 8 global devices as the in-process
# reference mesh (tests/conftest.py); 4x4 forms a 16-device cluster — a
# DIFFERENT mesh shape, which must still match bit-for-bit because
# trajectories depend only on the global env index, never on placement
# (parallel/mesh.py; the in-process 4-vs-8-device test pins the same
# invariant without processes).
CLUSTER_SHAPES = [(2, 4), (4, 2), (4, 4)]  # (n_processes, local_devices_per_process)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_cmd(port, nproc, pid, local_devices, out_path):
    return [
        sys.executable,
        "-m",
        "tetris_gymnasium_tpu.parallel.launch",
        "--backend",
        "cpu",
        "--local-devices",
        str(local_devices),
        "--coordinator",
        f"localhost:{port}",
        "--num-processes",
        str(nproc),
        "--process-id",
        str(pid),
        "--n-envs",
        str(N_ENVS),
        "--horizon",
        str(HORIZON),
        "--repeats",
        str(REPEATS),
        "--out",
        str(out_path),
    ]


def _spawn_cluster(nproc, local_devices, tmp_path):
    """Launch an nproc-process cluster; return each process's metrics JSON."""
    port = _free_port()
    env = dict(os.environ)
    # Keep workers off the real TPU tunnel entirely: without the pool-IP
    # hint the sitecustomize never registers the TPU plugin, and
    # JAX_PLATFORMS=cpu matches the launcher's own --backend cpu config.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs, outs = [], []
    for i in range(nproc):
        out = tmp_path / f"proc{i}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                _worker_cmd(port, nproc, i, local_devices, out),
                cwd=REPO_ROOT,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            logs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PIDs we spawned
    for p, log in zip(procs, logs):
        assert p.returncode == 0, (
            f"worker {p.args} exited {p.returncode}:\n{log[-4000:]}"
        )
    return [json.loads(o.read_text()) for o in outs]


@pytest.fixture(scope="module")
def single_process_reference():
    """The same program on this session's single-process 8-device mesh."""
    return launch.run(
        pmesh.env_mesh(), EngineConfig(auto_reset=True), N_ENVS, HORIZON, REPEATS
    )


@pytest.mark.parametrize("nproc,local_devices", CLUSTER_SHAPES)
def test_multiprocess_cluster_matches_single_process(
    nproc, local_devices, tmp_path, single_process_reference
):
    results = _spawn_cluster(nproc, local_devices, tmp_path)

    # (a) the distributed runtime really formed one global cluster
    for i, r in enumerate(results):
        assert r["process_count"] == nproc
        assert r["process_index"] == i
        assert r["n_devices"] == nproc * local_devices

    # every process of the cluster observed the same replicated outputs
    for r in results[1:]:
        assert r["checksum"] == results[0]["checksum"]
        assert r["sum_reward"] == results[0]["sum_reward"]
        assert r["sum_done"] == results[0]["sum_done"]

    # (b) bit-for-bit equal to the single-process run of the same program
    ref = single_process_reference
    got = results[0]
    assert got["checksum"] == ref["checksum"], (
        f"{nproc}x{local_devices} cluster diverged from single-process run"
    )
    assert got["sum_reward"] == ref["sum_reward"]
    assert got["sum_done"] == ref["sum_done"]
    assert got["sum_done"] > 0, "rollout never terminated an episode"


def test_launch_single_process_entrypoint(tmp_path):
    """(c) `launch` runs end-to-end without a coordinator (single host)."""
    out = tmp_path / "single.json"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # sitecustomize force-sets TPU_WORKER_HOSTNAMES=localhost on this machine,
    # which launch reads as a pod hint; clear it to exercise the plain path.
    env.pop("TPU_WORKER_HOSTNAMES", None)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable,
        "-m",
        "tetris_gymnasium_tpu.parallel.launch",
        "--backend",
        "cpu",
        "--local-devices",
        "8",
        "--n-envs",
        str(N_ENVS),
        "--horizon",
        str(HORIZON),
        "--repeats",
        str(REPEATS),
        "--out",
        str(out),
    ]
    res = subprocess.run(
        cmd,
        cwd=REPO_ROOT,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stdout[-4000:]
    metrics = json.loads(out.read_text())
    assert metrics["n_devices"] == 8
    assert metrics["process_count"] == 1
    assert "env-steps/s" in res.stdout


def test_multiprocess_ppo_training_matches_single_process(tmp_path):
    """BASELINE config 5's training side, executed for real: sharded PPO
    (params replicated, env batch P(\"env\"), XLA-inserted gradient
    all-reduce) across 2 OS processes must play the same trajectories as a
    single process — final env-state checksums bit-equal; losses equal to
    float tolerance (the all-reduce's partial-sum ORDER differs with
    process layout, so parameters match only to ulps, by design)."""
    iters = 3
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs, outs = [], []
    for i in range(2):
        out = tmp_path / f"ppo{i}.json"
        outs.append(out)
        cmd = _worker_cmd(port, 2, i, 4, out)
        cmd += ["--train", "ppo", "--train-iters", str(iters)]
        procs.append(
            subprocess.Popen(
                cmd, cwd=REPO_ROOT, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            logs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker exited {p.returncode}:\n{log[-4000:]}"
    results = [json.loads(o.read_text()) for o in outs]

    ref = launch.run_ppo(
        pmesh.env_mesh(), EngineConfig(auto_reset=True), N_ENVS, iters
    )
    got = results[0]
    assert got["n_devices"] == 8 and got["process_count"] == 2
    assert got["env_checksum"] == ref["env_checksum"], (
        "2-process PPO played different trajectories than single-process"
    )
    np.testing.assert_allclose(got["pg_losses"], ref["pg_losses"], rtol=1e-4, atol=1e-6)
    assert results[1]["env_checksum"] == got["env_checksum"]


def test_multiprocess_dqn_training_matches_single_process(tmp_path):
    """Cross-process DQN with a REPLICATED replay buffer: 2 OS processes
    must play the same trajectories AND accumulate bit-identical replay
    contents as a single process — final env-state and replay-buffer
    checksums bit-equal; losses equal to float tolerance (the learner
    consumes replicated data, but partial-sum order inside XLA reductions
    may differ across partitionings)."""
    iters = 4
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs, outs = [], []
    for i in range(2):
        out = tmp_path / f"dqn{i}.json"
        outs.append(out)
        cmd = _worker_cmd(port, 2, i, 4, out)
        cmd += ["--train", "dqn", "--train-iters", str(iters)]
        procs.append(
            subprocess.Popen(
                cmd, cwd=REPO_ROOT, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            logs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker exited {p.returncode}:\n{log[-4000:]}"
    results = [json.loads(o.read_text()) for o in outs]

    ref = launch.run_dqn(
        pmesh.env_mesh(), EngineConfig(auto_reset=True), N_ENVS, iters
    )
    got = results[0]
    assert got["n_devices"] == 8 and got["process_count"] == 2
    assert got["env_checksum"] == ref["env_checksum"], (
        "2-process DQN played different trajectories than single-process"
    )
    assert got["buffer_checksum"] == ref["buffer_checksum"], (
        "replicated replay diverged across the process split"
    )
    np.testing.assert_allclose(got["losses"], ref["losses"], rtol=1e-4, atol=1e-6)
    # both processes of the cluster observed identical replicated outputs
    assert results[1]["env_checksum"] == got["env_checksum"]
    assert results[1]["buffer_checksum"] == got["buffer_checksum"]


def test_checksum_is_mesh_shape_invariant_in_process():
    """Sanity: the checksum itself is sharding-invariant on one process."""
    config = EngineConfig(auto_reset=True)
    full = pmesh.env_mesh()
    half = pmesh.env_mesh(jax.devices()[:4])
    r_full = launch.run(full, config, N_ENVS, HORIZON, REPEATS)
    r_half = launch.run(half, config, N_ENVS, HORIZON, REPEATS)
    assert r_full["checksum"] == r_half["checksum"]
    assert r_full["sum_reward"] == r_half["sum_reward"]
    assert r_full["sum_done"] == r_half["sum_done"]
