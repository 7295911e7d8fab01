"""Mechanics parity: flagship engine vs the reference *OOP* env.

The two RNGs differ by construction (numpy PCG64 vs jax threefry), so full
trajectory parity is impossible; instead both engines are forced onto the
same piece sequence (a deterministic randomizer for the reference, a pinned
bag for ours) and the board evolution, positions, rewards and termination are
compared step for step across scripted action sequences.  This pins down the
OOP semantics our engine re-implements: gravity commits, swap/holder,
``(lines**2)*width`` scoring, spawn columns (ref: envs/tetris.py:203-272).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference
from tetris_gymnasium_tpu.config import ActionsMapping, EngineConfig
from tetris_gymnasium_tpu.core import engine

A = ActionsMapping()

pytestmark = requires_reference


def _make_ref_env(gravity=True):
    from tetris_gymnasium.components.tetromino_randomizer import Randomizer
    from tetris_gymnasium.envs.tetris import Tetris

    class SequenceRandomizer(Randomizer):
        """Deterministic piece order 0,1,2,...,6,0,1,... for parity tests."""

        def __init__(self, size):
            super().__init__(size)
            self.i = 0

        def get_next_tetromino(self) -> int:
            v = self.i % self.size
            self.i += 1
            return v

        def reset(self, seed=None):
            self.i = 0

    from tetris_gymnasium.components.tetromino_queue import TetrominoQueue

    # the reference constructor ignores injected components (it only assigns
    # self.randomizer/queue when the kwarg is None, envs/tetris.py:139-144),
    # so patch them in after construction
    env = Tetris(gravity=gravity)
    rand = SequenceRandomizer(7)
    env.randomizer = rand
    env.queue = TetrominoQueue(rand)
    env.reset(seed=1)
    return env


def _make_my_state(cfg):
    s, _ = engine.jit_reset(cfg)(jax.random.PRNGKey(0))
    # pin the same 0..6 cycle: active=0, preview=[1,2,3,4], bag continues 5,6
    s = s.replace(
        piece=jnp.int32(0),
        rotation=jnp.int32(0),
        x=jnp.int32(cfg.padded_width // 2 - 2),  # I piece box=4
        y=jnp.int32(0),
        bag=jnp.arange(7, dtype=jnp.int32),
        bag_index=jnp.int32(7),  # bag exhausted after the first 7 draws
        queue=jnp.arange(1, 1 + cfg.queue_size, dtype=jnp.int32),
    )
    # draws 5,6 still come from the pinned bag:
    s = s.replace(bag_index=jnp.int32(5))
    return s


ACTION_SCRIPTS = [
    # drift left and drop, repeatedly
    [A.move_left, A.move_left, A.hard_drop] * 4,
    # rotate + drift right
    [A.rotate_clockwise, A.move_right, A.move_right, A.hard_drop] * 4,
    # soft drops and no-ops under gravity
    [A.move_down, A.no_op, A.move_down, A.no_op] * 6,
    # counterclockwise rotations, mixed drops
    [A.rotate_counterclockwise, A.move_left, A.hard_drop, A.no_op] * 4,
    # swap early, then drop
    [A.swap, A.hard_drop, A.move_right, A.hard_drop, A.swap, A.hard_drop] * 2,
]


@pytest.mark.parametrize("gravity", [True, False])
@pytest.mark.parametrize("script", range(len(ACTION_SCRIPTS)))
def test_scripted_mechanics_parity(gravity, script):
    cfg = EngineConfig(gravity_enabled=gravity)
    ref = _make_ref_env(gravity=gravity)
    mine = _make_my_state(cfg)
    step = engine.jit_step(cfg)

    for t, action in enumerate(ACTION_SCRIPTS[script]):
        # re-pin the bag each step so draws beyond the first 7 continue the
        # same 0..6 cycle as the reference's SequenceRandomizer (the engine
        # would otherwise reshuffle randomly on bag exhaustion)
        mine = mine.replace(
            bag=jnp.arange(7, dtype=jnp.int32),
            bag_index=(mine.queue[-1] + 1) % 7,
        )
        ref_obs, ref_rew, ref_done, _, ref_info = ref.step(action)
        mine, my_obs, my_rew, my_done, my_info = step(mine, jnp.int32(action))

        assert float(ref_rew) == float(my_rew), f"reward @ step {t} (action {action})"
        assert bool(ref_done) == bool(my_done), f"done @ step {t}"
        assert int(ref_info["lines_cleared"]) == int(my_info["lines_cleared"]), f"lines @ {t}"
        # board ids are identical by construction (bedrock=1, pieces 2..8)
        assert np.array_equal(
            np.asarray(ref_obs["board"]), np.asarray(my_obs["board"])
        ), f"board image @ step {t}:\nref=\n{np.asarray(ref_obs['board'])}\nmine=\n{np.asarray(my_obs['board'])}"
        if not bool(ref_done):
            assert ref.x == int(mine.x) and ref.y == int(mine.y), f"position @ {t}"
        if bool(ref_done):
            break


@pytest.mark.parametrize("gravity", [True, False])
def test_queue_observation_parity(gravity):
    cfg = EngineConfig(gravity_enabled=gravity)
    ref = _make_ref_env(gravity=gravity)
    mine = _make_my_state(cfg)
    ref_obs = ref._get_obs()
    my_obs = engine.jit_observe(cfg)(mine)
    assert np.array_equal(np.asarray(ref_obs["queue"]), np.asarray(my_obs["queue"]))
    assert np.array_equal(np.asarray(ref_obs["holder"]), np.asarray(my_obs["holder"]))
    assert np.array_equal(np.asarray(ref_obs["board"]), np.asarray(my_obs["board"]))
    assert np.array_equal(
        np.asarray(ref_obs["active_tetromino_mask"]),
        np.asarray(my_obs["active_tetromino_mask"]),
    )


# ---------------------------------------------------------------------------
# Real bag refills + swap, cross-engine (no per-step re-pinning)
# ---------------------------------------------------------------------------

# Spread drops across columns; first swap stores (draws a piece), later swaps
# exchange with the holder.  ~16 locks = ~21 draws = two full bag refills.
REFILL_SCRIPT = (
    [A.swap, A.move_left, A.move_left, A.move_left, A.move_left, A.hard_drop]
    + [A.move_left, A.move_left, A.hard_drop]
    + [A.swap, A.hard_drop]
    + [A.move_right, A.move_right, A.hard_drop]
    + [A.move_right, A.move_right, A.move_right, A.move_right, A.hard_drop]
) * 4


def _record_engine_game(cfg, script):
    """Play the engine NATURALLY (its own bag, real refills) and reconstruct
    the underlying draw sequence from queue rotations."""
    mine, _ = engine.jit_reset(cfg)(jax.random.PRNGKey(3))
    seq = [int(mine.piece)] + [int(q) for q in np.asarray(mine.queue)]
    step = engine.jit_step(cfg)
    prev_q = np.asarray(mine.queue)
    snaps = []
    for action in script:
        mine, obs, rew, done, info = step(mine, jnp.int32(action))
        q = np.asarray(mine.queue)
        if not np.array_equal(q, prev_q):
            # commit (or holder-storing swap): queue rotates, tail = new draw
            assert np.array_equal(q[:-1], prev_q[1:]), "queue rotated unexpectedly"
            seq.append(int(q[-1]))
        prev_q = q
        snaps.append(
            (
                np.asarray(obs["board"]),
                float(rew),
                bool(done),
                int(info["lines_cleared"]),
                int(mine.x),
                int(mine.y),
                int(mine.holder_count),
            )
        )
        if done:
            break
    return seq, snaps


def _make_ref_env_with_sequence(seq, gravity):
    from tetris_gymnasium.components.tetromino_queue import TetrominoQueue
    from tetris_gymnasium.components.tetromino_randomizer import Randomizer
    from tetris_gymnasium.envs.tetris import Tetris

    class RecordedRandomizer(Randomizer):
        def __init__(self, size):
            super().__init__(size)
            self.i = 0

        def get_next_tetromino(self) -> int:
            if self.i >= len(seq):
                raise IndexError(
                    f"reference drew more pieces ({self.i + 1}) than the "
                    f"engine game recorded ({len(seq)}) — draw semantics diverged"
                )
            v = seq[self.i]
            self.i += 1
            return v

        def reset(self, seed=None):
            self.i = 0

    env = Tetris(gravity=gravity)
    rand = RecordedRandomizer(7)
    env.randomizer = rand
    env.queue = TetrominoQueue(rand)
    env.reset(seed=1)
    return env


@pytest.mark.parametrize("gravity", [True, False])
def test_refills_and_swap_parity_without_repinning(gravity):
    """A full game through >=2 real bag refills with swaps interleaved: the
    engine plays its own bag (refill shuffles included), the reference
    replays the engine's recorded draw sequence, and every step must match
    (VERDICT r2 #7: no per-step bag re-pinning)."""
    cfg = EngineConfig(gravity_enabled=gravity, auto_reset=False)
    seq, snaps = _record_engine_game(cfg, REFILL_SCRIPT)
    # two refills really happened: more than two bags' worth of draws
    assert len(seq) >= 15, f"only {len(seq)} draws — script too short for 2 refills"
    # 7-bag integrity across the recorded sequence (engine side)
    for start in range(0, 7 * (len(seq) // 7), 7):
        assert sorted(seq[start : start + 7]) == list(range(7)), (
            f"draws {start}..{start+7} are not a permutation of the 7 pieces"
        )

    ref = _make_ref_env_with_sequence(seq, gravity)
    swaps_exchanged = 0
    for t, action in enumerate(REFILL_SCRIPT[: len(snaps)]):
        ref_obs, ref_rew, ref_done, _, ref_info = ref.step(action)
        board, rew, done, lines, x, y, holder_count = snaps[t]
        assert float(ref_rew) == rew, f"reward @ step {t} (action {action})"
        assert bool(ref_done) == done, f"done @ step {t}"
        assert int(ref_info["lines_cleared"]) == lines, f"lines @ {t}"
        assert np.array_equal(np.asarray(ref_obs["board"]), board), f"board @ {t}"
        if not done:
            assert ref.x == x and ref.y == y, f"position @ {t}"
        if action == A.swap and holder_count:
            swaps_exchanged += 1
        if done:
            break
    assert swaps_exchanged >= 2, "script never exercised holder exchange"
