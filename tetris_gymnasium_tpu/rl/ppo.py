"""PPO, anakin-style: actor and learner co-located on device, one jitted step.

TPU-native re-design of the reference's CleanRL PPO example
(ref: examples/train_ppo.py) with the same algorithm and hyperparameter roles
(GAE, clipped surrogate, entropy bonus, value clipping, minibatch epochs;
ref: train_ppo.py:263-351) but an inverted execution model: the reference
steps 8 Python envs on host and ships observations to a GPU per step
(ref: train_ppo.py:185-190, 224-261); here the envs, the rollout buffer, the
policy and the optimizer all live on device and a whole
rollout-plus-update iteration is ONE XLA program.

Scaling: ``train_step`` is a pure function of (TrainState) -> (TrainState,
metrics).  Under ``jax.jit`` with the env batch sharded ``P("env")`` and
parameters replicated, XLA inserts the gradient all-reduce automatically —
the jit/pjit recipe, no hand-written collectives.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.models.networks import ActorCriticCNN
from tetris_gymnasium_tpu.ops import framestack
from tetris_gymnasium_tpu.rl.engines import env_fns as _env_fns


class PPOConfig(NamedTuple):
    """Static PPO hyperparameters (CleanRL names, ref: train_ppo.py:29-88)."""

    rollout_len: int = 128
    update_epochs: int = 6
    n_minibatches: int = 8
    gamma: float = 0.999
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    ent_coef: float = 0.1
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    learning_rate: float = 2.5e-4
    # Minibatch shuffle granularity: samples move in contiguous blocks of
    # this many adjacent envs (the batch axis is minor in the flattened
    # trajectory, so a block = one timestep x `shuffle_block` independent env
    # streams).  Per-sample random gathers of the observation tensor cost 7x
    # contiguous reads on TPU (58 ms vs 8 ms per epoch at 8192x64 — see
    # docs/scale/training_perf.md); block-granular shuffling makes the
    # gather near-streaming while every epoch still sees a fresh uniform
    # permutation of blocks.  1 = exact CleanRL per-sample shuffle
    # (ref: train_ppo.py:300-305).
    shuffle_block: int = 64
    # Annealing horizon in train_step calls; 0 disables both schedules.
    # With it set, the learning rate decays linearly to 0 over the run
    # (CleanRL's --anneal-lr, ref: train_ppo.py:139-141, 200-207) and the
    # entropy coefficient decays linearly from ``ent_coef`` to
    # ``ent_coef_final`` — round-4 PPO collapsed its entropy to 0.08 by 78M
    # steps and froze at 1.9 lines/episode; annealed exploration is what lets
    # long runs keep improving.
    total_iterations: int = 0
    ent_coef_final: float = 0.0
    # K: the policy consumes a [B, K, H, W] motion window (the reference PPO
    # workload's FrameStack(4), ref: train_ppo.py:108-110).  Unlike DQN's
    # replay (single frames, stacks rebuilt at sample time), the PPO rollout
    # stores the stacked window per transition — the rollout is consumed
    # once and discarded, so the K-fold memory is transient.
    frame_stack: int = 1


@struct.dataclass
class TrainState:
    """Everything a PPO iteration carries (a pytree; shard env_states P('env'))."""

    params: Any
    opt_state: Any
    env_states: engine.EngineState
    last_obs: jnp.ndarray  # int8 [B, H, W]
    key: jnp.ndarray
    # Train-step counter driving the annealing schedules; None (legacy
    # construction sites) is fine while ``total_iterations == 0``.
    update_i: Any = None


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def make_optimizer(ppo: PPOConfig) -> optax.GradientTransformation:
    """Adam with global-norm clipping (ref: train_ppo.py:182, 348-349).

    With ``total_iterations`` set the learning rate follows a linear decay to
    0 across every minibatch update of the run (CleanRL's --anneal-lr).
    """
    if ppo.total_iterations > 0:
        lr = optax.linear_schedule(
            init_value=ppo.learning_rate,
            end_value=0.0,
            transition_steps=(
                ppo.total_iterations * ppo.update_epochs * ppo.n_minibatches
            ),
        )
    else:
        lr = ppo.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(ppo.max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )


def init_train_state(
    key: jnp.ndarray, n_envs: int, env_config: EngineConfig, ppo: PPOConfig,
    net: ActorCriticCNN = ActorCriticCNN(),
    impl: str = "flagship",
    obs: str = "board",
) -> TrainState:
    """Initialise params, optimizer and a fresh sharded-ready env batch.

    ``obs="rgb84"`` trains on the reference workload's exact preprocessing
    chain (see rl/engines.py); with ``ppo.frame_stack > 1`` the carried
    ``last_obs`` is the ``[B, K, ...]`` motion window.
    """
    env_init, _, env_observe = _env_fns(env_config, impl, obs=obs)
    key, net_key, env_key = jax.random.split(key, 3)
    env_keys = jax.vmap(lambda i: jax.random.fold_in(env_key, i))(
        jnp.arange(n_envs, dtype=jnp.uint32)
    )
    env_states = env_init(env_keys)
    raw = env_observe(env_states)
    obs_0 = raw if ppo.frame_stack == 1 else framestack.init(raw, ppo.frame_stack)
    params = net.init(net_key, obs_0[:1])
    opt_state = make_optimizer(ppo).init(params)
    return TrainState(
        params=params, opt_state=opt_state, env_states=env_states,
        last_obs=obs_0, key=key, update_i=jnp.int32(0),
    )


def _gae(ppo: PPOConfig, traj: Transition, last_value: jnp.ndarray):
    """Generalised advantage estimation, reverse scan (ref: train_ppo.py:263-281)."""

    def one(carry, t):
        gae, next_value = carry
        not_done = 1.0 - t.done.astype(jnp.float32)
        delta = t.reward + ppo.gamma * next_value * not_done - t.value
        gae = delta + ppo.gamma * ppo.gae_lambda * not_done * gae
        return (gae, t.value), gae

    (_, _), advantages = jax.lax.scan(
        one, (jnp.zeros_like(last_value), last_value), traj, reverse=True
    )
    return advantages, advantages + traj.value


def make_train_step(
    env_config: EngineConfig, ppo: PPOConfig, net: ActorCriticCNN,
    impl: str = "flagship",
    rewards=None,
    obs: str = "board",
):
    """Build the jittable PPO iteration: rollout T steps, then update.

    ``env_config.auto_reset`` should be True so episodes restart on device
    (the reference relies on SyncVectorEnv's host-side autoreset,
    ref: train_ppo.py:185-190).  ``impl`` picks the rollout engine — see
    :func:`_env_fns`; the TrainState's ``env_states`` must come from
    :func:`init_train_state` with the same ``impl``.  ``rewards`` is an
    optional :class:`RewardsMapping` override (the reference's
    ``rewards_mapping`` kwarg).
    """
    _, env_step, observe = _env_fns(env_config, impl, rewards, obs=obs)
    K = ppo.frame_stack

    def policy_step(carry, _):
        env_states, window, params, key = carry
        key, act_key = jax.random.split(key)
        logits, value = net.apply(params, window)
        action = jax.random.categorical(act_key, logits).astype(jnp.int32)
        log_prob = jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), action]
        env_states, _, reward, done, _ = env_step(env_states, action)
        raw = observe(env_states)
        new_window = raw if K == 1 else framestack.push(window, raw, done)
        t = Transition(window, action, log_prob, value, reward, done)
        return (env_states, new_window, params, key), t

    def loss_fn(params, batch, advantages, targets, ent_coef):
        logits, value = net.apply(params, batch.obs)
        log_probs = jax.nn.log_softmax(logits)
        log_prob = log_probs[jnp.arange(logits.shape[0]), batch.action]
        ratio = jnp.exp(log_prob - batch.log_prob)

        adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps)
        pg_loss = jnp.maximum(pg1, pg2).mean()

        v_clipped = batch.value + jnp.clip(
            value - batch.value, -ppo.clip_eps, ppo.clip_eps
        )
        v_loss = 0.5 * jnp.maximum(
            (value - targets) ** 2, (v_clipped - targets) ** 2
        ).mean()

        entropy = -jnp.sum(jnp.exp(log_probs) * log_probs, axis=-1).mean()
        total = pg_loss + ppo.vf_coef * v_loss - ent_coef * entropy
        return total, (pg_loss, v_loss, entropy)

    optimizer = make_optimizer(ppo)

    def train_step(ts: TrainState) -> Tuple[TrainState, dict]:
        # -- schedules -------------------------------------------------------
        if ppo.total_iterations > 0:
            frac = jnp.clip(
                ts.update_i.astype(jnp.float32) / ppo.total_iterations, 0.0, 1.0
            )
            ent_coef = ppo.ent_coef + (ppo.ent_coef_final - ppo.ent_coef) * frac
        else:
            ent_coef = jnp.float32(ppo.ent_coef)

        # -- rollout ---------------------------------------------------------
        (env_states, last_obs, _, key), traj = jax.lax.scan(
            policy_step,
            (ts.env_states, ts.last_obs, ts.params, ts.key),
            None,
            length=ppo.rollout_len,
        )
        _, last_value = net.apply(ts.params, last_obs)
        advantages, targets = _gae(ppo, traj, last_value)

        # -- flatten [T, B] -> [n_blocks, block] ------------------------------
        # Sample index = t * B + b, so a shuffle block of `shuffle_block`
        # consecutive samples is `shuffle_block` adjacent (independent) env
        # streams at one timestep.
        n = ppo.rollout_len * last_obs.shape[0]
        if n % ppo.n_minibatches:
            raise ValueError(
                f"rollout samples ({n}) must divide into n_minibatches "
                f"({ppo.n_minibatches})"
            )
        # block must divide the minibatch size so every minibatch gets a
        # whole number of blocks; clamp to the largest compatible divisor
        # rather than rejecting odd env counts.
        block = math.gcd(max(1, ppo.shuffle_block), n // ppo.n_minibatches)
        n_blocks = n // block
        flat = jax.tree.map(
            lambda x: x.reshape((n_blocks, block) + x.shape[2:]), traj
        )
        adv_f = advantages.reshape(n_blocks, block)
        tgt_f = targets.reshape(n_blocks, block)
        merge = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731

        def epoch(carry, _):
            params, opt_state, key = carry
            key, perm_key = jax.random.split(key)
            perm = jax.random.permutation(perm_key, n_blocks)

            def minibatch(carry2, bidx):
                params, opt_state = carry2
                mb = jax.tree.map(lambda x: merge(x[bidx]), flat)
                grads, aux = jax.grad(loss_fn, has_aux=True)(
                    params, mb, merge(adv_f[bidx]), merge(tgt_f[bidx]), ent_coef
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            idxs = perm.reshape(ppo.n_minibatches, -1)
            (params, opt_state), aux = jax.lax.scan(
                minibatch, (params, opt_state), idxs
            )
            return (params, opt_state, key), aux

        (params, opt_state, key), aux = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, key), None, length=ppo.update_epochs
        )
        pg_loss, v_loss, entropy = jax.tree.map(lambda x: x[-1, -1], aux)

        metrics = {
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": entropy,
            "ent_coef": ent_coef,
            "mean_reward": traj.reward.mean(),
            "episodes_done": traj.done.sum(),
            "mean_score": ts.env_states.score.mean(),
        }
        new_ts = TrainState(
            params=params, opt_state=opt_state, env_states=env_states,
            last_obs=last_obs, key=key,
            update_i=None if ts.update_i is None else ts.update_i + 1,
        )
        return new_ts, metrics

    return train_step
