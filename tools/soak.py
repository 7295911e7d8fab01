"""Soak the turbo engine: billions of env-steps with invariant accounting.

Long-horizon stability evidence for the hot path: runs the batched engine
for a wall-clock budget and accumulates, ON DEVICE, the distributional
invariants a healthy Tetris engine must show —

  * line clears keep happening, with the frequency ordering single >=
    double >= triple >= tetris (a RANDOM policy almost never clears
    multiple rows at once — doubles are ~1e-4 of singles; that is the
    game, not the engine);
  * episodes keep terminating at a steady rate (auto-reset works forever);
  * scores stay finite and non-negative; the running active-piece
    occupancy histogram stays near-uniform (7-bag draws; occupancy is
    lifetime-weighted so the bound is loose).

Prints one JSON line and asserts the invariants.  BENCH_SECONDS controls
the wall-clock budget (default 60).
"""
import functools
import json
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
CHUNK = 512  # steps per device call


def main():
    enable_persistent_cache()
    budget_s = float(os.environ.get("BENCH_SECONDS", 60))
    config = EngineConfig(auto_reset=True)
    keys = batch_keys(jax.random.PRNGKey(42), B)
    states = jax.jit(functools.partial(turbo.init, config=config))(keys)

    def chunk(states, k):
        # Per-chunk int32 accumulators, totalled in host Python ints — a
        # device-resident running total would overflow int32 within minutes
        # at >100M steps/s (7 x 2.4B piece counts in the first soak run).
        acc0 = {
            "episodes": jnp.int32(0),
            "clears": jnp.zeros(4, jnp.int32),
            "pieces": jnp.zeros(7, jnp.int32),
            "max_score": jnp.float32(0),
            "score_bad": jnp.bool_(False),
        }

        def one(carry, _):
            s, k, acc = carry
            k, a = orng.randint(k, 8)
            s2, _, _r, d, info = turbo.step(s, a, config=config)
            lines = info["lines_cleared"]
            clears = jnp.stack(
                [jnp.sum((lines == n).astype(jnp.int32)) for n in (1, 2, 3, 4)]
            )
            piece_hist = jnp.sum(
                jax.nn.one_hot(s2.piece, 7, dtype=jnp.int32), axis=0
            )
            acc = {
                "episodes": acc["episodes"] + jnp.sum(d),
                "clears": acc["clears"] + clears,
                "pieces": acc["pieces"] + piece_hist,
                "max_score": jnp.maximum(acc["max_score"], jnp.max(s2.score)),
                "score_bad": acc["score_bad"]
                | jnp.any(~jnp.isfinite(s2.score) | (s2.score < 0)),
            }
            return (s2, k, acc), None

        (s, k, acc), _ = jax.lax.scan(one, (states, k, acc0), None, length=CHUNK)
        return s, k, acc

    chunk = jax.jit(chunk, donate_argnums=(0,))
    k = jnp.stack([jnp.full((B,), 3, jnp.uint32), jnp.arange(B, dtype=jnp.uint32)])

    totals = {"episodes": 0, "clears": [0] * 4, "pieces": [0] * 7}
    max_score, score_bad = 0.0, False

    def absorb(acc):
        nonlocal max_score, score_bad
        totals["episodes"] += int(acc["episodes"])
        for i, v in enumerate(acc["clears"]):
            totals["clears"][i] += int(v)
        for i, v in enumerate(acc["pieces"]):
            totals["pieces"][i] += int(v)
        max_score = max(max_score, float(acc["max_score"]))
        score_bad = score_bad or bool(acc["score_bad"])

    states, k, acc = chunk(states, k)  # warm-up/compile
    bool(acc["score_bad"])  # fence the warm-up; its counters are DISCARDED
    # so totals correspond exactly to the `steps` counted below
    t0 = time.perf_counter()
    steps = 0
    while time.perf_counter() - t0 < budget_s:
        states, k, acc = chunk(states, k)
        steps += CHUNK * B
        absorb(acc)
    dt = time.perf_counter() - t0

    clears = totals["clears"]
    pieces = totals["pieces"]
    result = {
        "env_steps": steps,
        "seconds": round(dt, 1),
        "steps_per_sec": round(steps / dt),
        "episodes": totals["episodes"],
        "clears_1234": clears,
        "piece_hist": pieces,
        "piece_uniformity": round(min(pieces) / max(pieces), 4),
        "max_score": max_score,
        "score_invariant_violated": score_bad,
    }
    print(json.dumps(result), flush=True)

    assert not result["score_invariant_violated"], "score went NaN/negative"
    assert result["episodes"] > 0, "auto-reset stopped terminating episodes"
    # observed single-clear rate under random play: ~0.6-0.8 per million
    # steps; require at least a quarter of that so short budgets pass too
    assert clears[0] > steps / 5e6, (
        f"line clears dried up: {clears} over {steps} steps"
    )
    assert clears[0] >= clears[1] >= clears[2] >= clears[3], (
        f"clear-type ordering violated under random play: {clears}"
    )
    assert result["piece_uniformity"] > 0.9, (
        f"piece occupancy distribution skewed: {pieces}"
    )
    print("soak OK")


if __name__ == "__main__":
    main()
