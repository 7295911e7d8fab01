"""Device-mesh sharding tests on the virtual 8-device CPU mesh.

Extends the reference's vmap-vs-loop equivalence pattern
(ref: tests/test_functional/test_jax_compat.py:77-106) to
mesh-sharded-vs-single-device equivalence, plus mesh-shape invariance of
trajectories (SURVEY.md §7 "multi-host determinism").
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine
from tetris_gymnasium_tpu.parallel import mesh as pmesh

CFG = EngineConfig(auto_reset=True)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_batch_keys_placement_independent():
    base = jax.random.PRNGKey(0)
    keys = np.asarray(pmesh.batch_keys(base, 16))
    expected = np.stack(
        [np.asarray(jax.random.fold_in(base, i)) for i in range(16)]
    )
    assert np.array_equal(keys, expected)


def test_sharded_reset_layout_and_values():
    m = pmesh.env_mesh()
    states, obs = pmesh.sharded_reset(jax.random.PRNGKey(0), 16, CFG, m, obs="board")
    assert states.board.shape == (16, CFG.padded_height, CFG.padded_width)
    # sharded along the env axis over all 8 devices
    assert len(states.board.sharding.device_set) == 8
    # values identical to the unsharded vmap path
    keys = pmesh.batch_keys(jax.random.PRNGKey(0), 16)
    ref = jax.vmap(functools.partial(engine.init_state, config=CFG))(keys)
    assert np.array_equal(np.asarray(states.board), np.asarray(ref.board))


def test_sharded_step_matches_unsharded():
    m = pmesh.env_mesh()
    states, _ = pmesh.sharded_reset(jax.random.PRNGKey(1), 16, CFG, m, obs="board")
    ref_states = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), states)

    actions = jnp.tile(jnp.arange(8, dtype=jnp.int32), 2)
    out = pmesh.sharded_step(states, actions, CFG, m, obs="board")
    ref_out = jax.jit(
        jax.vmap(
            functools.partial(engine.step, config=CFG, obs_fn=engine.observe_board)
        )
    )(ref_states, actions)

    for got, want in zip(jax.tree.leaves(out), jax.tree.leaves(ref_out)):
        assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_trajectories_invariant_to_mesh_shape(n_devices):
    """The same 16 envs produce identical rollouts on 1-, 2- and 8-device
    meshes (keys fold on the global env index, never device position)."""
    m = pmesh.env_mesh(jax.devices()[:n_devices])
    states, _ = pmesh.sharded_reset(jax.random.PRNGKey(2), 16, CFG, m, obs="board")
    final, tot_r, tot_d = pmesh.sharded_random_rollout(
        states, jax.random.PRNGKey(3), CFG, m, horizon=32, engine_kind="engine"
    )
    got = (
        np.asarray(final.board),
        np.asarray(final.score),
        float(tot_r),
        int(tot_d),
    )
    if not hasattr(test_trajectories_invariant_to_mesh_shape, "_ref"):
        test_trajectories_invariant_to_mesh_shape._ref = got
    ref = test_trajectories_invariant_to_mesh_shape._ref
    assert np.array_equal(got[0], ref[0])
    assert np.array_equal(got[1], ref[1])
    assert got[2] == ref[2] and got[3] == ref[3]
