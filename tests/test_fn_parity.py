"""Bit-exact parity of the compat engine vs the reference ``tetris_fn``.

The correctness gate from BASELINE.md config 1/2: same PRNG key + same action
sequence => byte-identical boards, observations, rewards, termination and RNG
keys.  The reference (pure JAX) runs on CPU as the oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tetris_gymnasium_tpu.config import EnvConfig
from tetris_gymnasium_tpu.core import fn_env
from tetris_gymnasium_tpu.ops.queue import BAG_QUEUE, UNIFORM_QUEUE

pytestmark = requires_reference


def _ref():
    from tetris_gymnasium.envs.tetris_fn import reset as ref_reset
    from tetris_gymnasium.envs.tetris_fn import step as ref_step
    from tetris_gymnasium.functional.core import EnvConfig as RefConfig
    from tetris_gymnasium.functional.queue import (
        bag_queue_get_next_element,
        create_bag_queue,
        create_uniform_queue,
        uniform_queue_get_next_element,
    )
    from tetris_gymnasium.functional.tetrominoes import TETROMINOES

    return {
        "reset": ref_reset,
        "step": ref_step,
        "Config": RefConfig,
        "tets": TETROMINOES,
        "bag": (create_bag_queue, bag_queue_get_next_element),
        "uniform": (create_uniform_queue, uniform_queue_get_next_element),
    }


def _state_equal(ref_state, my_state):
    pairs = [
        (ref_state.board, my_state.board),
        (ref_state.active_tetromino, my_state.piece),
        (ref_state.rotation, my_state.rotation),
        (ref_state.x, my_state.x),
        (ref_state.y, my_state.y),
        (ref_state.queue, my_state.queue),
        (ref_state.queue_index, my_state.queue_index),
        (ref_state.game_over, my_state.game_over),
        (ref_state.score, my_state.score),
        (ref_state.rng_key, my_state.rng_key),
    ]
    return all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in pairs)


@pytest.mark.parametrize("seed", [0, 1, 42, 1234])
def test_reset_parity(seed):
    r = _ref()
    cfg = EnvConfig()
    rcfg = r["Config"](10, 20, 4, 7, True)
    key = jax.random.PRNGKey(seed)
    rkey, rstate, robs = r["reset"](r["tets"], key, rcfg)
    mkey, mstate, mobs = fn_env.reset(key, cfg)
    assert np.array_equal(np.asarray(rkey), np.asarray(mkey))
    assert np.array_equal(np.asarray(robs), np.asarray(mobs))
    assert _state_equal(rstate, mstate)


def _scan_ref(r, rcfg, rstate, actions, next_q, batched=False):
    """Scan the reference step over an action sequence (one XLA program)."""

    def one(carry, action):
        if batched:
            s, o, rew, t, info = jax.vmap(
                lambda cs, ca: r["step"](r["tets"], cs, ca, rcfg, queue_fn=next_q)
            )(carry, action)
        else:
            s, o, rew, t, info = r["step"](r["tets"], carry, action, rcfg, queue_fn=next_q)
        return s, (o, rew, t, info["lines_cleared"], s.board, s.rng_key)

    return jax.jit(lambda s0, a: jax.lax.scan(one, s0, a))(rstate, actions)


def _scan_mine(cfg, mstate, actions, my_q):
    def one(carry, action):
        if mstate.board.ndim == 3:
            s, o, rew, t, info = jax.vmap(
                lambda cs, ca: fn_env.step(cs, ca, cfg, queue_fns=my_q)
            )(carry, action)
        else:
            s, o, rew, t, info = fn_env.step(carry, action, cfg, queue_fns=my_q)
        return s, (o, rew, t, info["lines_cleared"], s.board, s.rng_key)

    return jax.jit(lambda s0, a: jax.lax.scan(one, s0, a))(mstate, actions)


@pytest.mark.parametrize(
    "seed,gravity,queue", [(0, True, "bag"), (7, True, "bag"), (3, False, "bag"), (0, True, "uniform")]
)
def test_trajectory_parity(seed, gravity, queue):
    """Fixed-seed random-policy trajectories are identical step-for-step."""
    r = _ref()
    cfg = EnvConfig(gravity_enabled=gravity)
    rcfg = r["Config"](10, 20, 4, 7, gravity)
    create_q, next_q = r[queue]
    my_q = BAG_QUEUE if queue == "bag" else UNIFORM_QUEUE

    key = jax.random.PRNGKey(seed)
    _, rstate, _ = r["reset"](r["tets"], key, rcfg, create_queue_fn=create_q, queue_fn=next_q)
    _, mstate, _ = fn_env.reset(key, cfg, queue_fns=my_q)

    rng = np.random.default_rng(seed)
    actions = jnp.asarray(rng.integers(0, 7, size=300), dtype=jnp.int32)
    rfinal, rtraj = _scan_ref(r, rcfg, rstate, actions, next_q)
    mfinal, mtraj = _scan_mine(cfg, mstate, actions, my_q)

    names = ["obs", "reward", "terminated", "lines", "board", "rng_key"]
    for name, a, b in zip(names, rtraj, mtraj):
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{name} trajectory mismatch"
    assert _state_equal(rfinal, mfinal)


def test_batched_parity_vs_reference_vmap():
    """Batched engine == reference vmapped step on a shared key grid."""
    r = _ref()
    cfg = EnvConfig()
    rcfg = r["Config"](10, 20, 4, 7, True)
    B, T = 32, 100
    keys = jax.random.split(jax.random.PRNGKey(5), B)

    ref_reset_b = jax.vmap(lambda k: r["reset"](r["tets"], k, rcfg))
    _, rstates, robs = jax.jit(ref_reset_b)(keys)
    _, mstates, mobs = fn_env.batched_reset(keys, config=cfg)
    assert np.array_equal(np.asarray(robs), np.asarray(mobs))

    _, next_q = r["bag"]
    rng = np.random.default_rng(11)
    actions = jnp.asarray(rng.integers(0, 7, size=(T, B)), dtype=jnp.int32)
    rfinal, rtraj = _scan_ref(r, rcfg, rstates, actions, next_q, batched=True)
    mfinal, mtraj = _scan_mine(cfg, mstates, actions, BAG_QUEUE)

    names = ["obs", "reward", "terminated", "lines", "board", "rng_key"]
    for name, a, b in zip(names, rtraj, mtraj):
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{name} batch mismatch"
