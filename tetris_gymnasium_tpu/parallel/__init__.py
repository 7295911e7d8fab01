"""Device-mesh parallelism: env-batch sharding, per-env PRNG, multi-host."""
from tetris_gymnasium_tpu.parallel.mesh import (
    batch_keys,
    env_mesh,
    env_sharding,
    initialize_distributed,
    replicated,
    sharded_random_rollout,
    sharded_reset,
    sharded_step,
)

__all__ = [
    "batch_keys",
    "env_mesh",
    "env_sharding",
    "initialize_distributed",
    "replicated",
    "sharded_random_rollout",
    "sharded_reset",
    "sharded_step",
]
