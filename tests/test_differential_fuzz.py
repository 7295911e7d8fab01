"""Randomized differential fuzzing: flagship engine vs the reference OOP env.

The scripted-parity suite (tests/test_engine_vs_oop.py, test_wide_boards.py)
pins hand-chosen action sequences; this file drives BOTH engines with the
same *random* piece sequences and *random* action streams — hundreds of
episodes across several geometries with swap/holder, rotation walls, soft
drops and gravity exercised by chance rather than by construction — and
demands zero divergence in board image, reward, termination, lines and the
active-piece position at every step (round-4 review next #7).

Synchronization recipe (the RNGs differ by construction): the reference gets
a ListRandomizer replaying a pinned random sequence; our engine's bag is
re-pinned to the same upcoming window before every step, so both draw the
identical piece stream.  Ref: envs/tetris.py:203-272 step semantics.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import requires_reference
from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig
from tetris_gymnasium_tpu.core import engine

A = ActionsMapping()

pytestmark = requires_reference

# (width, height, gravity, episodes, max_steps)
GEOMETRIES = [
    (10, 20, True, 40, 120),
    (10, 20, False, 25, 120),
    (8, 14, True, 25, 120),
    (14, 20, True, 25, 120),
]


def _make_ref_env(width, height, gravity, piece_seq):
    from tetris_gymnasium.components.tetromino_queue import TetrominoQueue
    from tetris_gymnasium.components.tetromino_randomizer import Randomizer
    from tetris_gymnasium.envs.tetris import Tetris

    class ListRandomizer(Randomizer):
        """Replays a pinned random piece sequence."""

        def __init__(self, size, seq):
            super().__init__(size)
            self.seq = seq
            self.i = 0

        def get_next_tetromino(self) -> int:
            v = self.seq[self.i % len(self.seq)]
            self.i += 1
            return int(v)

        def reset(self, seed=None):
            self.i = 0

    env = Tetris(width=width, height=height, gravity=gravity)
    env.randomizer = ListRandomizer(7, piece_seq)
    env.queue = TetrominoQueue(env.randomizer)
    env.reset(seed=1)
    return env


def _make_my_state(cfg, piece_seq, jit_reset):
    """Engine state on the same pinned sequence: active = seq[0], preview
    queue = seq[1:1+queue_size]; later draws come from the re-pinned bag."""
    import jax

    from tetris_gymnasium_tpu.ops.board import spawn_x_classic
    from tetris_gymnasium_tpu.pieces import PIECES

    s, _ = jit_reset(jax.random.PRNGKey(0))
    q = cfg.queue_size
    p0 = int(piece_seq[0])
    sx = int(spawn_x_classic(cfg.padded_width, int(np.asarray(PIECES.box)[p0])))
    return s.replace(
        piece=jnp.int32(p0),
        rotation=jnp.int32(0),
        x=jnp.int32(sx),
        y=jnp.int32(0),
        queue=jnp.asarray(piece_seq[1 : 1 + q], dtype=jnp.int32),
    )


def _pin_bag(state, piece_seq, drawn):
    """Point the bag at the next 7 sequence elements; one draw per step max."""
    window = [int(piece_seq[(drawn + j) % len(piece_seq)]) for j in range(7)]
    return state.replace(
        bag=jnp.asarray(window, dtype=jnp.int32), bag_index=jnp.int32(0)
    )


@pytest.mark.parametrize("width,height,gravity,episodes,max_steps", GEOMETRIES)
def test_random_differential_episodes(width, height, gravity, episodes, max_steps):
    import jax

    cfg = EngineConfig(width=width, height=height, gravity_enabled=gravity)
    step = engine.jit_step(cfg)
    jit_reset = engine.jit_reset(cfg)
    rng = np.random.default_rng(width * 1000 + height * 10 + gravity)

    swaps = 0
    total_steps = 0
    total_lines = 0
    for ep in range(episodes):
        piece_seq = rng.integers(0, 7, 256)
        ref = _make_ref_env(width, height, gravity, piece_seq)
        mine = _make_my_state(cfg, piece_seq, jit_reset)
        drawn = 1 + cfg.queue_size  # active + preview already consumed

        if ep % 2 == 0:
            # half the episodes start on a nearly-full stack (one gap column,
            # O-piece id 2 on both boards) so random play actually completes
            # rows and the line-clear path is fuzzed, not just survival
            gap = int(rng.integers(0, width))
            board = np.asarray(mine.board).copy()
            p = cfg.padding
            rows = slice(height - 4, height)
            board[rows, p : p + width] = 2
            board[rows, p + gap] = 0
            # two already-complete rows: they clear at the first piece lock,
            # so single- and double-line clears are exercised every episode
            board[height - 2 : height, p + gap] = 2
            ref.board = board.copy()
            mine = mine.replace(board=jnp.asarray(board))

        for t in range(max_steps):
            action = int(rng.integers(0, 8))
            swaps += action == A.swap
            mine = _pin_bag(mine, piece_seq, drawn)
            pre_bag_index = int(mine.bag_index)
            ref_obs, ref_rew, ref_done, _, ref_info = ref.step(action)
            mine, my_obs, my_rew, my_done, my_info = step(mine, jnp.int32(action))
            drawn += int(mine.bag_index) - pre_bag_index

            ctx = f"geom=({width}x{height},g={gravity}) ep={ep} t={t} a={action}"
            assert float(ref_rew) == float(my_rew), f"reward @ {ctx}"
            assert bool(ref_done) == bool(my_done), f"done @ {ctx}"
            assert int(ref_info["lines_cleared"]) == int(
                my_info["lines_cleared"]
            ), f"lines @ {ctx}"
            assert np.array_equal(
                np.asarray(ref_obs["board"]), np.asarray(my_obs["board"])
            ), f"board @ {ctx}"
            assert np.array_equal(
                np.asarray(ref_obs["holder"]), np.asarray(my_obs["holder"])
            ), f"holder @ {ctx}"
            assert np.array_equal(
                np.asarray(ref_obs["queue"]), np.asarray(my_obs["queue"])
            ), f"queue @ {ctx}"
            total_steps += 1
            total_lines += int(ref_info["lines_cleared"])
            if not bool(ref_done):
                assert ref.x == int(mine.x) and ref.y == int(mine.y), f"pos @ {ctx}"
            else:
                break
    # the parity must not be vacuous: episodes run deep and clear lines
    assert swaps > 10, "fuzz must exercise the holder path"
    assert total_steps > episodes * 10, f"episodes too short ({total_steps} steps)"
    assert total_lines > 0, "fuzz never cleared a line — widen max_steps"
