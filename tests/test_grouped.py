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
