"""Isolate the unattributed ~136 ms of the PPO iteration (tools/profile_training.py).

Times, on the real chip: the epoch permutation sort, the random minibatch
gather of the flattened trajectory, a contiguous-slice variant, and the
rollout-only train step.  Informs the docs/scale/training_perf.md attribution.
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache

B = int(os.environ.get("BENCH_ENVS", 8192))
T = 64
N = B * T
REPEATS = 5


def timed(fn, *args, fence):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / REPEATS


def main():
    enable_persistent_cache()
    results = {}
    obs = jnp.zeros((N, 20, 10), jnp.int8)
    key = jax.random.PRNGKey(0)

    # 1. the permutation itself (sort of N keys)
    perm_fn = jax.jit(lambda k: jax.random.permutation(k, N))
    results["permutation_ms"] = timed(perm_fn, key, fence=lambda o: int(o[0])) * 1e3

    # 2. random gather of the full flattened obs (one epoch's traffic)
    perm = perm_fn(key)
    gather = jax.jit(lambda o, p: jnp.sum(o[p].astype(jnp.int32)))
    results["random_gather_ms"] = timed(gather, obs, perm, fence=float) * 1e3

    # 3. contiguous minibatch slicing (no shuffle) for comparison
    slc = jax.jit(
        lambda o: sum(
            jnp.sum(jax.lax.dynamic_slice_in_dim(o, i * (N // 4), N // 4).astype(jnp.int32))
            for i in range(4)
        )
    )
    results["contiguous_slices_ms"] = timed(slc, obs, fence=float) * 1e3

    # 4. Feistel-style affine pseudo-shuffle gather (no sort): idx = (a*i+b) % N
    def affine_gather(o, k):
        a = jax.random.randint(k, (), 0, N // 2) * 2 + 1  # odd => invertible mod 2^k
        b = jax.random.randint(k, (), 0, N)
        i = jnp.arange(N, dtype=jnp.uint32)
        idx = (a.astype(jnp.uint32) * i + b.astype(jnp.uint32)) % jnp.uint32(N)
        return jnp.sum(o[idx].astype(jnp.int32))
    affine = jax.jit(affine_gather)
    results["affine_gather_ms"] = timed(affine, obs, key, fence=float) * 1e3

    # 5. GAE alone at [T, B]
    from tetris_gymnasium_tpu.rl import ppo as rl_ppo
    pcfg = rl_ppo.PPOConfig(rollout_len=T, update_epochs=2, n_minibatches=4)
    tr = rl_ppo.Transition(
        obs=jnp.zeros((T, B, 20, 10), jnp.int8),
        action=jnp.zeros((T, B), jnp.int32),
        log_prob=jnp.zeros((T, B), jnp.float32),
        value=jnp.zeros((T, B), jnp.float32),
        reward=jnp.zeros((T, B), jnp.float32),
        done=jnp.zeros((T, B), jnp.bool_),
    )
    gae = jax.jit(lambda t, lv: rl_ppo._gae(pcfg, t, lv)[0].sum())
    results["gae_ms"] = timed(gae, tr, jnp.zeros((B,), jnp.float32), fence=float) * 1e3

    # 6. flatten (reshape copy) of the trajectory obs
    flat = jax.jit(lambda t: jax.tree.map(
        lambda x: x.reshape((N,) + x.shape[2:]), t).obs.sum(dtype=jnp.int32))
    results["flatten_ms"] = timed(flat, tr, fence=float) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
