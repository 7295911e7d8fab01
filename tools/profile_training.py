"""Decompose the two training-path bench numbers into component timings.

VERDICT r2 flagged `actor_steps_per_sec` (config 3) and `ppo_env_steps_per_sec`
as unexplained.  This script measures, on the real chip, each stage of those
pipelines in isolation — turbo env step, board observation, CNN forward,
fwd+bwd minibatch update, and the composed programs — and prints a roofline
table (achieved TFLOP/s vs the analytic FLOP count of the model) so the bench
numbers are attributable to specific stages.  Results are summarised in
docs/scale/training_perf.md.

Run: python tools/profile_training.py  (BENCH_ENVS / PROFILE_DIR env vars).
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import turbo
from tetris_gymnasium_tpu.models import ActorCriticCNN, QNetworkCNN
from tetris_gymnasium_tpu.ops import rng as orng
from tetris_gymnasium_tpu.parallel.mesh import batch_keys
from tetris_gymnasium_tpu.rl import ppo as rl_ppo
from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache

B = int(os.environ.get("BENCH_ENVS", 8192))
L = 64  # scan length for per-component loops
REPEATS = 3


def timed(fn, *args, repeats=REPEATS, fence=lambda out: None):
    """Compile, then time `repeats` calls fenced by a value fetch."""
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / repeats


def fence_tree(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    jnp.asarray(leaf).reshape(-1)[0].item()


def forward_flops_per_sample(H=20, W=10):
    """Analytic FLOPs of BoardEncoder+head per sample (models/networks.py)."""
    f = 0
    # conv1 3x3 1->32 stride (2,1): out [10, 10, 32]
    f += 10 * 10 * 32 * 3 * 3 * 1 * 2
    # conv2 3x3 32->64 stride (2,2): out [5, 5, 64]
    f += 5 * 5 * 64 * 3 * 3 * 32 * 2
    # conv3 3x3 64->128 stride (2,2): out [3, 3, 128]
    f += 3 * 3 * 128 * 3 * 3 * 64 * 2
    # dense 1152->512 + head 512*8
    f += 1152 * 512 * 2 + 512 * 8 * 2
    return f


def main():
    enable_persistent_cache()
    config = EngineConfig(auto_reset=True)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, B={B}, L={L}")
    results = {}

    keys = batch_keys(jax.random.PRNGKey(0), B)
    states = jax.jit(functools.partial(turbo.init, config=config))(keys)

    # -- 1. bare env step (scan, on-device random actions) -------------------
    def env_only(states, k):
        def one(c, _):
            s, k = c
            k, a = orng.randint(k, 8)
            s2, _, r, d, _ = turbo.step(s, a, config=config)
            return (s2, k), None
        (s, k), _ = jax.lax.scan(one, (states, k), None, length=L)
        return s
    env_only = jax.jit(env_only)
    akey = jnp.stack([jnp.full((B,), 7, jnp.uint32), jnp.arange(B, dtype=jnp.uint32)])
    t = timed(env_only, states, akey, fence=fence_tree)
    results["env_step_us_per_iter"] = t / L * 1e6
    results["env_steps_per_sec"] = B * L / t

    # -- 2. observation only --------------------------------------------------
    def obs_only(states):
        def one(c, _):
            o = turbo.observe_board(c, config)
            return c, jnp.sum(o.astype(jnp.int32))
        _, o = jax.lax.scan(one, states, None, length=L)
        return o
    obs_only = jax.jit(obs_only)
    t = timed(obs_only, states, fence=fence_tree)
    results["observe_us_per_iter"] = t / L * 1e6

    # -- 3. CNN forward only (greedy head) ------------------------------------
    net = QNetworkCNN()
    obs0 = turbo.observe_board(states, config)
    params = net.init(jax.random.PRNGKey(2), obs0[:2])
    def fwd_only(params, obs):
        def one(c, _):
            q = net.apply(params, obs)
            return c + jnp.sum(q, dtype=jnp.float32), None
        acc, _ = jax.lax.scan(one, jnp.float32(0), None, length=L)
        return acc
    fwd_only = jax.jit(fwd_only)
    t = timed(fwd_only, params, obs0, fence=lambda o: float(o))
    fwd_us = t / L * 1e6
    results["cnn_forward_us_per_iter"] = fwd_us
    flops = forward_flops_per_sample() * B
    results["cnn_forward_tflops"] = flops / (fwd_us / 1e6) / 1e12

    # -- 4. composed actor feed ----------------------------------------------
    def actor(states, params):
        def one(c, _):
            s, acc = c
            o = turbo.observe_board(s, config)
            q = net.apply(params, o)
            a = jnp.argmax(q, axis=-1).astype(jnp.int32)
            s2, _, r, d, _ = turbo.step(s, a, config=config)
            return (s2, acc + jnp.sum(r)), None
        (s, acc), _ = jax.lax.scan(one, (states, jnp.float32(0)), None, length=L)
        return acc
    actor = jax.jit(actor)
    t = timed(actor, states, params, fence=lambda o: float(o))
    results["actor_us_per_iter"] = t / L * 1e6
    results["actor_steps_per_sec"] = B * L / t

    # -- 5. PPO update only (fwd+bwd+adam per minibatch) ----------------------
    pcfg = rl_ppo.PPOConfig(rollout_len=64, update_epochs=2, n_minibatches=4)
    ac = ActorCriticCNN()
    ts = jax.jit(
        functools.partial(
            rl_ppo.init_train_state, n_envs=B, env_config=config, ppo=pcfg, impl="turbo"
        )
    )(jax.random.PRNGKey(5))
    n = pcfg.rollout_len * B
    mb = n // pcfg.n_minibatches
    mb_obs = jnp.zeros((mb, config.height, config.width), jnp.int8)
    mb_act = jnp.zeros((mb,), jnp.int32)
    mb_lp = jnp.zeros((mb,), jnp.float32)
    mb_val = jnp.zeros((mb,), jnp.float32)
    optimizer = rl_ppo.make_optimizer(pcfg)

    def loss_fn(params, obs, action, old_lp, old_val, adv, tgt):
        logits, value = ac.apply(params, obs)
        lp = jax.nn.log_softmax(logits)[jnp.arange(mb), action]
        ratio = jnp.exp(lp - old_lp)
        a = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = jnp.maximum(-a * ratio, -a * jnp.clip(ratio, 0.8, 1.2)).mean()
        v = 0.5 * ((value - tgt) ** 2).mean()
        return pg + 0.5 * v

    def update_once(params, opt_state):
        g = jax.grad(loss_fn)(params, mb_obs, mb_act, mb_lp, mb_val, mb_lp, mb_val)
        up, opt_state = optimizer.update(g, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, up), opt_state
    update_once = jax.jit(update_once, donate_argnums=(0, 1))

    params_copy = jax.jit(lambda p: jax.tree.map(jnp.copy, p))(ts.params)
    opt_state = optimizer.init(params_copy)
    params2, opt_state = update_once(params_copy, opt_state)
    fence_tree(params2)
    t0 = time.perf_counter()
    for _ in range(REPEATS * 4):
        params2, opt_state = update_once(params2, opt_state)
    fence_tree(params2)
    t = (time.perf_counter() - t0) / (REPEATS * 4)
    results["update_ms_per_minibatch"] = t * 1e3
    n_upd = pcfg.update_epochs * pcfg.n_minibatches
    results["update_ms_per_iter_total"] = t * 1e3 * n_upd
    results["update_tflops"] = 3 * forward_flops_per_sample() * mb / t / 1e12
    print(json.dumps({k: round(v, 3) for k, v in results.items()}), flush=True)

    # -- 6. full PPO train step -----------------------------------------------
    train_step = jax.jit(
        rl_ppo.make_train_step(config, pcfg, ac, impl="turbo"), donate_argnums=(0,)
    )
    ts, m = train_step(ts)
    float(m["pg_loss"])
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        ts, m = train_step(ts)
    float(m["pg_loss"])
    t = (time.perf_counter() - t0) / REPEATS
    results["ppo_iter_ms"] = t * 1e3
    results["ppo_env_steps_per_sec"] = B * pcfg.rollout_len / t

    # modeled decomposition of the PPO iteration
    rollout_ms = (
        results["actor_us_per_iter"] * pcfg.rollout_len / 1e3
    )  # fwd+obs+step per rollout step (categorical ~ argmax cost-wise)
    results["model_rollout_ms"] = rollout_ms
    results["model_update_ms"] = results["update_ms_per_iter_total"]
    results["model_unattributed_ms"] = (
        t * 1e3 - rollout_ms - results["update_ms_per_iter_total"]
    )

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
