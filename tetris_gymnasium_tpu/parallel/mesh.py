"""Device-mesh sharding of environment batches.

The reference's only parallelism is single-host ``vmap``/``SyncVectorEnv``
(ref: tetris_gymnasium/envs/tetris_fn.py:416-467; examples/train_cnn.py:251-256).
This module is the TPU-native scale-out layer it lacks: a 1-D ``"env"`` mesh
over all local (or all global) devices, env-state pytrees sharded along the
batch axis with ``NamedSharding(P("env"))``, and jitted step/rollout programs
whose sharding is carried in-types so XLA partitions them without any
collectives (env stepping is embarrassingly parallel; collectives appear only
in the learner, see ``tetris_gymnasium_tpu.rl``).

Determinism across mesh shapes: per-env PRNG streams are derived by
``fold_in(base_key, global_env_index)``, so trajectories depend only on the
global env index, never on device placement.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tetris_gymnasium_tpu.config import EngineConfig, EnvConfig
from tetris_gymnasium_tpu.core import engine, fn_env


def env_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "env") -> Mesh:
    """A 1-D mesh of all (or the given) devices with one ``env`` axis."""
    import numpy as np

    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Sharding that splits the leading (env-batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding on the mesh (for params/configs)."""
    return NamedSharding(mesh, P())


def batch_keys(base_key: jnp.ndarray, n_envs: int) -> jnp.ndarray:
    """Per-env keys ``[n_envs, 2]``, folded from one base key by global index.

    Placement-independent: env ``i`` gets ``fold_in(base, i)`` no matter how
    the batch is laid out over devices, so a run is reproducible on any mesh
    shape (SURVEY.md §7 "multi-host determinism").
    """
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
        jnp.arange(n_envs, dtype=jnp.uint32)
    )


@functools.lru_cache(maxsize=None)
def _sharded_engine_fns(config: EngineConfig, mesh: Mesh, obs: str):
    obs_fn = {"dict": engine.observe_dict, "board": engine.observe_board}[obs]
    shard = env_sharding(mesh)

    reset_fn = jax.jit(
        jax.vmap(functools.partial(engine.reset, config=config, obs_fn=obs_fn)),
        in_shardings=(shard,),
        out_shardings=shard,
    )
    step_fn = jax.jit(
        jax.vmap(functools.partial(engine.step, config=config, obs_fn=obs_fn)),
        donate_argnums=(0,),
    )
    return reset_fn, step_fn


@functools.lru_cache(maxsize=None)
def _sharded_reset_fn(config: EngineConfig, mesh: Mesh, obs: str, n_envs: int):
    """Jitted reset whose per-env keys are derived INSIDE the program.

    ``fold_in(base, global_env_index)`` runs under the partitioner with a
    replicated base key, so the keys (and therefore every trajectory) are
    identical on any mesh shape and any process count — this is what makes
    multi-host runs bit-comparable to single-process ones, and it avoids
    materialising a host-global key array (which a multi-process runtime
    cannot ``device_put`` from one host).
    """
    obs_fn = {"dict": engine.observe_dict, "board": engine.observe_board}[obs]

    def reset(base_key):
        idx = jnp.arange(n_envs, dtype=jnp.uint32)
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(idx)
        return jax.vmap(functools.partial(engine.reset, config=config, obs_fn=obs_fn))(
            keys
        )

    return jax.jit(
        reset,
        in_shardings=(replicated(mesh),),
        out_shardings=env_sharding(mesh),
    )


def sharded_reset(
    base_key: jnp.ndarray,
    n_envs: int,
    config: EngineConfig,
    mesh: Mesh,
    obs: str = "board",
):
    """Reset ``n_envs`` flagship envs sharded over the mesh's env axis."""
    return _sharded_reset_fn(config, mesh, obs, n_envs)(base_key)


def sharded_step(states, actions, config: EngineConfig, mesh: Mesh, obs: str = "board"):
    """One sharded batched step; state buffers are donated."""
    return _sharded_engine_fns(config, mesh, obs)[1](states, actions)


@functools.lru_cache(maxsize=None)
def _sharded_rollout_fn(config: EngineConfig, mesh: Mesh, horizon: int, engine_kind: str):
    """One XLA program: scan `horizon` random-policy steps over sharded envs.

    The action stream is on-device (per-step fold of a rollout key), so the
    host is touched exactly twice: keys in, trajectory stats out.
    """
    shard = env_sharding(mesh)
    if engine_kind == "engine":
        step_fn = functools.partial(engine.step, config=config, obs_fn=lambda s, c, p: ())
        n_actions = 8
    else:
        step_fn = functools.partial(fn_env.step, config=config)
        n_actions = 7

    def rollout(states, rollout_key):
        def one(carry, t):
            s, k = carry
            k, sub = jax.random.split(k)
            n = s.board.shape[0]
            acts = jax.random.randint(sub, (n,), 0, n_actions)
            out = jax.vmap(step_fn)(s, acts)
            s2, r, d = out[0], out[2], out[3]
            return (s2, k), (jnp.sum(r), jnp.sum(d))

        (final, _), (rews, dones) = jax.lax.scan(
            one, (states, rollout_key), jnp.arange(horizon)
        )
        return final, jnp.sum(rews), jnp.sum(dones)

    return jax.jit(rollout, in_shardings=(shard, replicated(mesh)), donate_argnums=(0,))


def sharded_random_rollout(
    states,
    rollout_key: jnp.ndarray,
    config,
    mesh: Mesh,
    horizon: int,
    engine_kind: str = "engine",
):
    """Run ``horizon`` random steps on-device; returns (states, Σreward, Σdone).

    The state pytree is (re-)laid out ``P("env")`` on entry, so callers may
    pass states produced on any mesh.
    """
    states = jax.device_put(states, env_sharding(mesh))
    return _sharded_rollout_fn(config, mesh, horizon, engine_kind)(states, rollout_key)


def batch_minor_shardings(mesh: Mesh, tree, axis: str = "env"):
    """Per-leaf shardings for batch-MINOR pytrees (turbo layout): the env
    axis is the LAST axis of every array."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P(*((None,) * (len(x.shape) - 1)), axis)), tree
    )


def train_state_shardings(mesh: Mesh, ts, impl: str = "flagship"):
    """Shardings for an ``rl.ppo.TrainState``: params/opt replicated, env
    batch sharded (leading axis for the flagship engine, minor axis for
    turbo), observations and rollout keys on the batch axis.

    This is THE distributed-training recipe of the framework: annotate in-
    and out-shardings, let XLA insert the gradient all-reduce (no hand
    collectives) — identical code single-host and across a pod slice.
    """
    repl = replicated(mesh)
    env = (
        batch_minor_shardings(mesh, ts.env_states)
        if impl == "turbo"
        else jax.tree.map(lambda _: env_sharding(mesh), ts.env_states)
    )
    return type(ts)(
        params=jax.tree.map(lambda _: repl, ts.params),
        opt_state=jax.tree.map(lambda _: repl, ts.opt_state),
        env_states=env,
        last_obs=env_sharding(mesh),
        key=repl,
        update_i=None if ts.update_i is None else repl,
    )


def dqn_state_shardings(mesh: Mesh, ts, impl: str = "flagship"):
    """Shardings for an ``rl.dqn.DQNState``: learner state replicated, env
    batch sharded, **replay buffer replicated**.

    Replicating the buffer is the deliberate choice for cross-host DQN:
    per-step writes all-gather only the newest (tiny) transition block over
    the mesh, every sampling gather then stays device-local, and — because
    transitions and sampling keys are deterministic functions of replicated
    inputs — the buffer contents are provably identical on every process
    (``tests/test_multihost.py`` checksums them bit-for-bit).  A buffer
    sharded along capacity would save HBM but turn every uniform sample
    into a cross-host shuffle over DCN; env replay blocks are small enough
    that replication is the right trade until buffers approach HBM size.
    """
    repl = replicated(mesh)
    env = (
        batch_minor_shardings(mesh, ts.env_states)
        if impl == "turbo"
        else jax.tree.map(lambda _: env_sharding(mesh), ts.env_states)
    )
    return type(ts)(
        params=jax.tree.map(lambda _: repl, ts.params),
        target_params=jax.tree.map(lambda _: repl, ts.target_params),
        opt_state=jax.tree.map(lambda _: repl, ts.opt_state),
        buffer=jax.tree.map(lambda _: repl, ts.buffer),
        env_states=env,
        obs=env_sharding(mesh),
        step=repl,
        key=repl,
    )


@functools.lru_cache(maxsize=None)
def _checksum_fn(mesh: Mesh):
    def checksum(leaves):
        def one(x):
            x = jnp.asarray(x)
            if x.dtype == jnp.float32:
                # capture the exact bit pattern, not a lossy int cast
                x = jax.lax.bitcast_convert_type(x, jnp.uint32)
            else:
                x = x.astype(jnp.uint32)
            return jnp.sum(x.reshape(-1), dtype=jnp.uint32)

        return [one(x) for x in leaves]

    return jax.jit(checksum, out_shardings=replicated(mesh))


def state_checksum(states, mesh: Mesh) -> dict:
    """Placement-invariant ``uint32`` checksum of every field of a state pytree.

    Each leaf is bit-viewed as ``uint32`` and summed with wraparound
    arithmetic — associative and commutative, so the result is EXACTLY the
    same no matter how the batch is sharded over devices or processes.  The
    cross-device reduction is replicated on output, so every process of a
    multi-host run can read it; equal dicts across mesh shapes certify
    bit-identical global state.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(states)
    paths = [jax.tree_util.keystr(p) for p, _ in flat]
    sums = _checksum_fn(mesh)([x for _, x in flat])
    return {p: int(s) for p, s in zip(paths, sums)}


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` passthrough.

    Idempotent: a no-op when the distributed runtime is already up.  Every
    *other* failure (unreachable coordinator, bad process counts, mismatched
    addresses) propagates — a misconfigured pod slice must fail loudly at
    startup, not silently run single-host.  Call once at program start on
    each host of a pod slice.
    """
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(**kwargs)
