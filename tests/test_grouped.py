"""Grouped placement engine tests.

Mirrors the reference's grouped-env suite including the golden-board fixture
(ref: tests/test_grouped_env/: expected_result_i_placement.csv, the literal
4x10 action-mask matrix, sentinel observations).  The fixture board is
reconstructed here from the reference recipe
(ref: tests/helpers/mock.py:5-47).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from gymnasium import spaces

from tetris_gymnasium_tpu.config import EngineConfig
from tetris_gymnasium_tpu.core import engine, grouped
from tetris_gymnasium_tpu.ops.board import create_board

CFG = EngineConfig(gravity_enabled=False)
H, W, P = CFG.height, CFG.width, CFG.padding

GOLDEN_CSV = "/root/reference/tests/test_grouped_env/expected_result_i_placement.csv"


def example_board():
    """The reference's half-filled fixture board with known features
    (ref: tests/helpers/mock.py:5-47): heights [10,11,10,10,11,11,10,10,10,0],
    3 holes, bumpiness 14."""
    board = np.asarray(create_board(H, W, P)).copy()
    top = H // 2
    board[top:H, P : -(P + 1)] = 2
    board[top - 1, P + 1] = 2
    board[top - 1, P + 4] = 2
    board[top - 1, P + 5] = 2
    board[top + 2, P + 2] = 0
    board[top + 4, P + 3] = 0
    board[top + 6, P + 6] = 0
    return board


def _state_with(board, piece=0, rotation=0):
    s, _ = engine.jit_reset(CFG)(jax.random.PRNGKey(0))
    return s.replace(
        board=jnp.asarray(board), piece=jnp.int32(piece), rotation=jnp.int32(rotation)
    )


def test_encode_decode_roundtrip():
    for a in range(40):
        x, r = grouped.decode_action(a)
        assert grouped.encode_action(x, r) == a


@pytest.mark.skipif(not os.path.exists(GOLDEN_CSV), reason="reference golden missing")
def test_golden_i_placement():
    """Action (column 5, rotation 1) with a vertical I == the reference golden
    board (the reference fixture paints the piece with its raw matrix value 1;
    our engine stamps the real piece id 2 — transform and compare)."""
    golden = np.genfromtxt(GOLDEN_CSV, delimiter=",").astype(np.uint8)

    state = _state_with(example_board(), piece=0, rotation=1)  # vertical I
    boards, mask, over, lines = grouped.placements(state, CFG)
    got = np.asarray(boards[grouped.encode_action(5, 1)])

    want = golden.copy().astype(np.int8)
    placed_cells = np.zeros_like(want, dtype=bool)
    placed_cells[:H, P:-P] = golden[:H, P:-P] == 1  # fixture painted 1s
    want[placed_cells] = 2
    assert np.array_equal(got, want), f"got:\n{got}\nwant:\n{want}"


def test_golden_action_mask():
    """Literal legality-mask matrix for the vertical I on the fixture board
    (ref: tests/test_grouped_env/actions/test_grouped_actions.py:11-36)."""
    state = _state_with(example_board(), piece=0, rotation=1)
    _, mask, _, _ = grouped.placements(state, CFG)
    expected = np.array(
        [
            [0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
            [0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
            [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
            [0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
        ]
    ).reshape(40, order="F")
    assert np.array_equal(np.asarray(mask), expected)


def test_illegal_placements_are_all_ones():
    state = _state_with(example_board(), piece=0, rotation=1)
    boards, mask, _, _ = grouped.placements(state, CFG)
    illegal = np.where(np.asarray(mask) == 0)[0]
    assert len(illegal) > 0
    for a in illegal:
        assert np.all(np.asarray(boards[a]) == 1), f"candidate {a} should be all ones"


def test_game_over_placements_are_all_zeros():
    board = np.asarray(create_board(H, W, P)).copy()
    board[0:H, P:-P] = 2  # stack to the ceiling
    state = _state_with(board, piece=0, rotation=1)
    boards, mask, over, _ = grouped.placements(state, CFG)
    boards, mask = np.asarray(boards), np.asarray(mask)
    hit = [(mask[a] == 1) and np.all(boards[a] == 0) for a in range(40)]
    assert any(hit), "full board should produce game-over (all-zero) placements"


def test_step_places_and_rederives_mask():
    state = _state_with(example_board(), piece=0, rotation=1)
    _, mask0 = grouped.jit_observation(CFG)(state)
    gs = grouped.GroupedState(env=state, mask=mask0)
    gstep = grouped.jit_step(CFG)
    gs2, obs, reward, done, info = gstep(gs, jnp.int32(grouped.encode_action(5, 1)))
    assert not bool(done)
    assert float(reward) == 1.0  # no lines cleared -> alife only
    assert info["action_mask"].shape == (40,)
    # the board advanced: a new piece is active, the stack contains the I
    assert int(np.asarray(gs2.env.board).sum()) > int(np.asarray(state.board).sum())
    assert obs.shape == (40, H + P, W + 2 * P)


def test_illegal_action_terminates_with_sentinel():
    state = _state_with(example_board(), piece=0, rotation=1)
    _, mask0 = grouped.jit_observation(CFG)(state)
    gs = grouped.GroupedState(env=state, mask=mask0)
    illegal_action = int(np.where(np.asarray(mask0) == 0)[0][0])
    gstep = grouped.jit_step(CFG)
    gs2, obs, reward, done, info = gstep(gs, jnp.int32(illegal_action))
    assert bool(done)
    assert float(reward) == pytest.approx(-0.1)
    assert np.all(np.asarray(obs) == H * W)  # high-valued sentinel
    # env state untouched
    assert np.array_equal(np.asarray(gs2.env.board), np.asarray(state.board))


def test_illegal_action_noop_penalty_mode():
    state = _state_with(example_board(), piece=0, rotation=1)
    _, mask0 = grouped.jit_observation(CFG)(state)
    gs = grouped.GroupedState(env=state, mask=mask0)
    illegal_action = int(np.where(np.asarray(mask0) == 0)[0][0])
    gstep = grouped.jit_step(CFG, terminate_on_illegal=False)
    gs2, obs, reward, done, info = gstep(gs, jnp.int32(illegal_action))
    assert not bool(done)
    assert float(reward) == pytest.approx(-0.1)


def test_features_mode_shapes():
    state = _state_with(example_board(), piece=0, rotation=1)
    obs, mask = grouped.jit_observation(CFG, mode="features")(state)
    assert obs.shape == (40, W + 3)
    # legal non-game-over candidates have plausible heights (<= H)
    legal = np.asarray(mask) == 1
    assert np.all(np.asarray(obs)[legal, :W] <= H)


def test_batched_grouped():
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    gs, obs = grouped.batched_reset(keys, config=CFG)
    assert obs.shape == (B, 40, H + P, W + 2 * P)
    acts = jnp.asarray([int(np.asarray(gs.mask[b]).argmax()) for b in range(B)], dtype=jnp.int32)
    gs2, obs2, rew, done, info = grouped.batched_step(gs, acts, config=CFG)
    assert rew.shape == (B,)
    assert info["action_mask"].shape == (B, 40)


# -- wrapper-level tests (ref: tests/test_grouped_env/actions/) ---------------


def _wrapped_env_with_fixture(inner_wrapper_types=()):
    """A GroupedActionsObservations wrapper forced into the fixture state
    (vertical I on the half-filled board), like the reference's
    `tetris_env_grouped` fixture (ref: tests/test_grouped_env/conftest.py).
    ``inner_wrapper_types`` are observation-wrapper classes applied around
    the *same* base env (the reference passes wrapper instances of the
    wrapped env, ref: train_lin_grouped.py:130-153)."""
    import gymnasium as gym

    import tetris_gymnasium_tpu.envs  # noqa: F401
    from tetris_gymnasium_tpu.wrappers import GroupedActionsObservations

    env = gym.make("tetris_gymnasium_tpu/Tetris", gravity=False)
    observation_wrappers = [wt(env) for wt in inner_wrapper_types] or None
    w = GroupedActionsObservations(env, observation_wrappers=observation_wrappers)
    w.reset(seed=0)
    forced = w.env.unwrapped.state.replace(
        board=jnp.asarray(example_board()), piece=jnp.int32(0), rotation=jnp.int32(1)
    )
    w.env.unwrapped.state = forced
    _, mask = w._observe(forced)
    w._gstate = grouped.GroupedState(env=forced, mask=mask)
    w.legal_actions_mask = np.asarray(mask)
    return w


def test_wrapper_step_matches_golden():
    """`step(5*4+1)` leaves the golden board on the base env (wrapper-level
    mirror of ref test_grouped_actions.py:4-8)."""
    if not os.path.exists(GOLDEN_CSV):
        pytest.skip("reference golden missing")
    golden = np.genfromtxt(GOLDEN_CSV, delimiter=",").astype(np.uint8)
    want = golden.copy()
    want[:H, P:-P][golden[:H, P:-P] == 1] = 2  # fixture paints 1; engine ids

    w = _wrapped_env_with_fixture()
    obs, reward, done, truncated, info = w.step(5 * 4 + 1)
    assert not done
    got = np.asarray(w.env.unwrapped.state.board)
    assert np.array_equal(got, want), f"got:\n{got}\nwant:\n{want}"
    assert "board" in info  # post-step board info (ref: grouped.py:260-267)
    assert obs.shape == (40, H + P, W + 2 * P)
    w.env.close()


def test_wrapper_info_board_through_observation_wrappers():
    """info["board"] carries the post-step obs through the inner wrappers
    (feature vectors feed the replay buffer, ref: train_lin_grouped.py:344-351)."""
    from tetris_gymnasium_tpu.wrappers import FeatureVectorObservation

    w = _wrapped_env_with_fixture(inner_wrapper_types=[FeatureVectorObservation])
    # reset path sets info["board"] too
    obs0, info0 = w.reset(seed=1)
    assert info0["board"].shape == (W + 3,)

    legal = int(np.where(w.legal_actions_mask == 1)[0][0])
    obs, reward, done, truncated, info = w.step(legal)
    assert info["board"].shape == (W + 3,)
    # the feature vector reflects the post-step stack (nonzero after a lock)
    assert info["board"].sum() > 0
    w.env.close()


def test_wrapper_info_board_absent_on_illegal():
    w = _wrapped_env_with_fixture()
    illegal = int(np.where(w.legal_actions_mask == 0)[0][0])
    obs, reward, done, truncated, info = w.step(illegal)
    assert done and "board" not in info
    w.env.close()


# -- per-candidate inner observation wrappers (ref: grouped.py:183-206) -------


def test_wrapper_rgb_inner_mode_and_space():
    """[RgbObservation] inner wrapper => per-candidate RGB composites with an
    honest uint8 0..255 space (the reference declares high=h*w even for RGB
    inner wrappers — a space bug, like FeatureVectorObservation's)."""
    from tetris_gymnasium_tpu.wrappers import RgbObservation

    w = _wrapped_env_with_fixture(inner_wrapper_types=[RgbObservation])
    assert w.mode == "rgb"
    obs, info = w.reset(seed=3)
    assert obs.shape == w.observation_space.shape and obs.dtype == np.uint8
    assert w.observation_space.shape[0] == 40 and w.observation_space.shape[-1] == 3
    legal = int(np.where(w.legal_actions_mask == 1)[0][0])
    obs, reward, done, truncated, info = w.step(legal)
    assert obs.shape == w.observation_space.shape
    w.env.close()


def test_wrapper_rgb_mode_matches_host_recipe():
    """The fused device rgb mode == the generic host chain (Dict rebuild per
    candidate + RgbObservation.observation), on the scripted fixture board."""
    from tetris_gymnasium_tpu.wrappers import RgbObservation

    w = _wrapped_env_with_fixture(inner_wrapper_types=[RgbObservation])
    dev_obs, _ = w._observe(w._gstate.env)

    # host recipe: raw candidate boards + live strips through the wrapper
    boards, _ = grouped.jit_observation(CFG, "boards")(w._gstate.env)
    base_obs = w.env.unwrapped._to_numpy(w.env.unwrapped._observe(w._gstate.env))
    host = w._apply_candidates(np.asarray(boards), base_obs)
    assert np.array_equal(np.asarray(dev_obs), host)
    w.env.close()


def test_wrapper_host_chain_arbitrary_wrapper():
    """A user-defined observation wrapper (not one of ours) is honored per
    candidate via the host path, matching a manual per-candidate loop."""
    import gymnasium as gym

    class BoardSum(gym.ObservationWrapper):
        """Maps the Dict obs to a 1-element vector: sum of board cells."""

        def __init__(self, env):
            super().__init__(env)
            self.observation_space = spaces.Box(0, 1e9, (1,), dtype=np.float32)

        def observation(self, observation):
            return np.asarray([observation["board"].sum()], dtype=np.float32)

    import tetris_gymnasium_tpu.envs  # noqa: F401
    from tetris_gymnasium_tpu.wrappers import GroupedActionsObservations

    env = gym.make("tetris_gymnasium_tpu/Tetris", gravity=False)
    # two wrappers => no single-wrapper fast path => host mode
    inner = [BoardSum(env), BoardSum(env)]

    class Passthrough(gym.ObservationWrapper):
        def __init__(self, env):
            super().__init__(env)
            self.observation_space = spaces.Box(0, 1e9, (1,), dtype=np.float32)

        def observation(self, observation):
            return observation

    w = GroupedActionsObservations(env, observation_wrappers=[inner[0], Passthrough(env)])
    assert w.mode == "host"
    obs, info = w.reset(seed=0)
    boards, _ = grouped.jit_observation(CFG, "boards")(w._gstate.env)
    want = np.asarray(boards).sum(axis=(1, 2), keepdims=False)[:, None]
    np.testing.assert_allclose(obs, want.astype(np.float32))
    w.env.close()


def test_wrapper_host_chain_features_matches_features_mode():
    """mode="host" with [FeatureVectorObservation] equals the fused features
    kernel (candidate features from the candidate boards, sentinels included)."""
    from tetris_gymnasium_tpu.wrappers import FeatureVectorObservation

    import gymnasium as gym
    import tetris_gymnasium_tpu.envs  # noqa: F401
    from tetris_gymnasium_tpu.wrappers import GroupedActionsObservations

    env = gym.make("tetris_gymnasium_tpu/Tetris", gravity=False)
    fv = FeatureVectorObservation(env)
    fast = GroupedActionsObservations(env, observation_wrappers=[fv])
    slow = GroupedActionsObservations(env, observation_wrappers=[fv], mode="host")
    assert fast.mode == "features" and slow.mode == "host"
    obs_f, _ = fast.reset(seed=5)
    obs_h, _ = slow.reset(seed=5)
    np.testing.assert_allclose(obs_f, obs_h.astype(np.float32))
    env.close()


def test_wrapper_unknown_inner_wrapper_raises():
    """Anything without .observation() raises instead of silently changing
    the observation (round-4 review weak #4)."""
    import gymnasium as gym
    import tetris_gymnasium_tpu.envs  # noqa: F401
    from tetris_gymnasium_tpu.wrappers import GroupedActionsObservations

    env = gym.make("tetris_gymnasium_tpu/Tetris", gravity=False)
    with pytest.raises(TypeError, match="observation"):
        GroupedActionsObservations(env, observation_wrappers=[object(), object()])
    env.close()


def test_wrapper_host_illegal_sentinel_is_space_high():
    """Illegal+terminate in host mode: ones * observation_space.high of the
    WRAPPED space, no chain on the sentinel (ref: grouped.py:221-224)."""
    from tetris_gymnasium_tpu.wrappers import RgbObservation

    w = _wrapped_env_with_fixture(inner_wrapper_types=[RgbObservation])
    w.mode = "host"  # force the host path on the same rgb-shaped space
    illegal = int(np.where(w.legal_actions_mask == 0)[0][0])
    obs, reward, done, truncated, info = w.step(illegal)
    assert done
    assert np.all(obs == w.observation_space.high.flat[0])
    w.env.close()


@pytest.mark.skipif(
    not os.path.exists("/root/reference/tetris_gymnasium"),
    reason="reference repo missing",
)
def test_rgb_inner_wrapper_matches_reference_per_candidate():
    """Literal parity: our fused rgb mode == the reference's
    GroupedActionsObservations(observation_wrappers=[RgbObservation]) output
    on the same pinned state (scripted piece sequence + fixture stack),
    candidate for candidate (ref: grouped.py:183-206)."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from tetris_gymnasium.components.tetromino_queue import TetrominoQueue
    from tetris_gymnasium.components.tetromino_randomizer import Randomizer
    from tetris_gymnasium.envs.tetris import Tetris
    from tetris_gymnasium.wrappers.grouped import (
        GroupedActionsObservations as RefGrouped,
    )
    from tetris_gymnasium.wrappers.observation import RgbObservation as RefRgb

    class SequenceRandomizer(Randomizer):
        def __init__(self, size):
            super().__init__(size)
            self.i = 0

        def get_next_tetromino(self) -> int:
            v = self.i % self.size
            self.i += 1
            return v

        def reset(self, seed=None):
            self.i = 0

    ref = Tetris(render_mode=None)
    rand = SequenceRandomizer(7)
    ref.randomizer = rand
    ref.queue = TetrominoQueue(rand)
    ref_gw = RefGrouped(ref, observation_wrappers=[RefRgb(ref)])
    base_obs, _ = ref.reset(seed=1)

    # half-filled stack on both sides (O-piece id 2) to exercise clears,
    # sentinels and frame legality in the candidate set
    fixture = example_board()
    ref.board = np.asarray(fixture).copy()
    ref_obs = ref_gw.observation(base_obs)
    ref_mask = np.asarray(ref_gw.legal_actions_mask)

    from tests.test_engine_vs_oop import _make_my_state

    cfg = EngineConfig()
    mine = _make_my_state(cfg).replace(board=jnp.asarray(fixture))
    my_obs, my_mask = grouped.jit_observation(cfg, "rgb")(mine)

    assert np.array_equal(np.asarray(my_mask), ref_mask)
    assert my_obs.shape == ref_obs.shape
    assert np.array_equal(np.asarray(my_obs), ref_obs.astype(np.uint8))
