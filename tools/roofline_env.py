"""Speed-of-light analysis of the turbo step program.

Compiles the 64-step turbo rollout and prints XLA's cost analysis next to
the measured wall time, answering "would a hand-written (Pallas) kernel be
faster?":

* `bytes accessed` per iteration ~= the state pytree size itself — XLA has
  fully fused the step; there is no intermediate HBM traffic for a custom
  kernel to eliminate.
* the measured iteration time is ~45x the HBM-floor time, so the program is
  VPU-compute-bound on packed integer ops; a Pallas kernel executing the
  same game logic issues the same vector ops.

See docs/environments/turbo.md (speed-of-light section) for the analysis.
"""
import functools
import os
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import turbo
from tetris_gymnasium_tpu.ops import rng as orng
from tetris_gymnasium_tpu.parallel.mesh import batch_keys
from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache

B = int(os.environ.get("BENCH_ENVS", 65536))
L = 64
HBM_GBPS = 819.0  # v5e


def main():
    enable_persistent_cache()
    config = EngineConfig(auto_reset=True)
    keys = batch_keys(jax.random.PRNGKey(0), B)
    states = jax.jit(functools.partial(turbo.init, config=config))(keys)

    def rollout(states, k):
        def one(c, _):
            s, k, acc = c
            k, a = orng.randint(k, 8)
            s2, _, r, d, _ = turbo.step(s, a, config=config)
            return (s2, k, acc + jnp.sum(d)), None

        (s, k, fence), _ = jax.lax.scan(
            one, (states, k, jnp.int32(0)), None, length=L
        )
        return s, fence

    akey = jnp.stack(
        [jnp.full((B,), 7, jnp.uint32), jnp.arange(B, dtype=jnp.uint32)]
    )
    comp = jax.jit(rollout).lower(states, akey).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]

    state_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(states)
    )
    bytes_per_iter = ca["bytes accessed"] / L
    floor_us = bytes_per_iter / (HBM_GBPS * 1e9) * 1e6

    out, fence = comp(states, akey)
    int(fence)  # value fetch — block_until_ready is unreliable through the tunnel
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        out, fence = comp(out, akey)
    int(fence)
    iter_us = (time.perf_counter() - t0) / reps / L * 1e6

    print(f"B={B}  state={state_bytes/1e6:.1f} MB")
    print(f"XLA bytes-accessed/iter: {bytes_per_iter/1e6:.1f} MB "
          f"({bytes_per_iter/state_bytes:.2f}x state size -> fully fused)")
    print(f"HBM floor/iter:  {floor_us:8.1f} us")
    print(f"measured/iter:   {iter_us:8.1f} us "
          f"({B/iter_us:.1f}M steps/s, compute/floor = {iter_us/floor_us:.1f}x)")
    print("=> VPU-compute-bound; fusion already optimal (no Pallas win on memory)")


if __name__ == "__main__":
    main()
