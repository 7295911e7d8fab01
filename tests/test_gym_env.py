"""Gymnasium shell tests: API compliance, determinism, state cloning.

Mirrors the reference's integration suite (ref: tests/test_integration/
test_gameplay.py, tests/test_base_env/test_base_env_general.py:139-173).
"""
import gymnasium as gym
import numpy as np
import pytest

import tetris_gymnasium_tpu.envs  # noqa: F401 (registers the env)


@pytest.fixture()
def env():
    e = gym.make("tetris_gymnasium_tpu/Tetris", render_mode="rgb_array")
    yield e
    e.close()


def test_env_checker_compliance(env):
    """gymnasium.utils.env_checker passes (ref: test_gameplay.py:25-32)."""
    from gymnasium.utils.env_checker import check_env

    check_env(env.unwrapped, skip_render_check=True)


def test_registration_and_spaces(env):
    assert env.action_space.n == 8
    obs, info = env.reset(seed=0)
    assert set(obs) == {"board", "active_tetromino_mask", "holder", "queue"}
    for k, space in env.observation_space.items():
        assert obs[k].shape == space.shape, k
        assert obs[k].dtype == space.dtype, k


def test_same_seed_same_episode(env):
    """Same seed -> identical 50-step trajectories (ref: test_base_env_reset.py:26-33)."""
    def play(seed):
        obs, _ = env.reset(seed=seed)
        frames = [obs["board"]]
        rng = np.random.default_rng(7)
        for _ in range(50):
            obs, r, term, trunc, _ = env.step(int(rng.integers(0, 8)))
            frames.append(obs["board"])
            if term:
                break
        return frames

    a, b = play(11), play(11)
    assert len(a) == len(b)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


@pytest.mark.parametrize("trial", range(10))
def test_clone_restore_determinism(env, trial):
    """clone -> act -> restore -> act must match exactly
    (ref: test_base_env_general.py:139-173, run 100x there)."""
    env.reset(seed=trial)
    rng = np.random.default_rng(trial)
    for _ in range(int(rng.integers(1, 20))):
        env.step(int(rng.integers(0, 8)))

    snapshot = env.unwrapped.get_state()
    actions = [int(rng.integers(0, 8)) for _ in range(10)]

    first = [env.step(a) for a in actions]
    env.unwrapped.set_state(snapshot)
    second = [env.step(a) for a in actions]

    for (o1, r1, t1, _, i1), (o2, r2, t2, _, i2) in zip(first, second):
        assert r1 == r2 and t1 == t2
        assert i1["lines_cleared"] == i2["lines_cleared"]
        for k in o1:
            assert np.array_equal(o1[k], o2[k]), k


def test_render_rgb_array(env):
    env.reset(seed=0)
    frame = env.render()
    cfg = env.unwrapped.config
    side = max(cfg.queue_size, cfg.holder_size) * cfg.padding
    assert frame.shape == (cfg.padded_height, cfg.padded_width + side, 3)
    assert frame.dtype == np.uint8


def test_ansi_render():
    """Cropped, id-charactered ANSI format (ref: envs/tetris.py:352-360)."""
    env = gym.make("tetris_gymnasium_tpu/Tetris", render_mode="ansi")
    env.reset(seed=0)
    text = env.render()
    lines = text.split("\n")
    cfg = env.unwrapped.config
    assert len(lines) == cfg.height
    assert all(len(line) == cfg.width for line in lines)
    # padding is cropped: no bedrock characters, only ids and empties
    assert set("".join(lines)) <= set(".2345678")
    env.close()


def test_ansi_render_matches_reference():
    """Snapshot parity: identical state renders the identical string."""
    import copy as _copy

    from tetris_gymnasium.envs.tetris import Tetris as RefTetris

    env = gym.make("tetris_gymnasium_tpu/Tetris", render_mode="ansi")
    env.reset(seed=3)
    for a in [0, 3, 2, 5, 1, 4, 2, 5]:  # a few moves/rotations/drops
        env.step(a)
    state = env.unwrapped.state

    ref = RefTetris(render_mode="ansi")
    ref.reset(seed=0)
    # Force the reference env into the exact same (board, piece, pose).
    ref.board = np.asarray(state.board, dtype=np.uint8).copy()
    piece = int(state.piece)
    tet = _copy.deepcopy(ref.tetrominoes[piece])
    for _ in range(int(state.rotation) % 4):
        tet = ref.rotate(tet, True)
    ref.active_tetromino = tet
    ref.x, ref.y = int(state.x), int(state.y)

    assert env.render() == ref.render()
    env.close()


def test_random_play_reaches_game_over():
    """Random play terminates (ref: functional test_integration.py:20-43)."""
    env = gym.make("tetris_gymnasium_tpu/Tetris")
    env.reset(seed=5)
    rng = np.random.default_rng(5)
    for step in range(10_000):
        _, _, term, _, _ = env.step(int(rng.integers(0, 8)))
        if term:
            break
    assert term, "random play never reached game over in 10k steps"
    env.close()


def test_custom_action_mapping_must_be_bijective():
    """Duplicate or out-of-range custom action ids fail at construction
    instead of silently overwriting table slots (round-2 review weak #6)."""
    import pytest

    from tetris_gymnasium_tpu.config import ActionsMapping
    from tetris_gymnasium_tpu.envs.gym_env import Tetris

    with pytest.raises(ValueError, match="distinct"):
        Tetris(actions_mapping=ActionsMapping(move_left=1, move_right=1))
    with pytest.raises(ValueError, match="0..7"):
        Tetris(actions_mapping=ActionsMapping(hard_drop=11))

    # a legal permutation still works and translates correctly
    amap = ActionsMapping(
        move_left=7, move_right=6, move_down=5, rotate_clockwise=4,
        rotate_counterclockwise=3, hard_drop=2, swap=1, no_op=0,
    )
    env = Tetris(actions_mapping=amap)
    obs, _ = env.reset(seed=0)
    x0 = int(env.state.x)
    env.step(7)  # user id 7 = move_left
    assert int(env.state.x) == x0 - 1
