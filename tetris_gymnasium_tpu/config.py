"""Configuration layer: env geometry, action and reward mappings.

TPU-native re-design of the reference config layer
(ref: tetris_gymnasium/functional/core.py:11-25 ``EnvConfig``,
tetris_gymnasium/mappings/actions.py:5-19 ``ActionsMapping``,
tetris_gymnasium/mappings/rewards.py:5-15 ``RewardsMapping``).

Everything here is *static* (hashable) so it can be passed as a static
argument under ``jax.jit`` — config never lives in device memory.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple


class EnvConfig(NamedTuple):
    """Static geometry + rules of a Tetris environment.

    Mirrors the reference ``EnvConfig`` (functional/core.py:11-25) and extends
    it with the knobs the OOP env exposes via constructor kwargs
    (ref: envs/tetris.py:77-107).

    Attributes:
        width: playfield width (columns).
        height: playfield height (rows).
        padding: bedrock frame thickness; right/left/bottom of the board.
        queue_size: for the compat engine this is both the number of distinct
            pieces and the bag length (reference quirk, functional/queue.py:35).
        gravity_enabled: whether a gravity sub-step runs after each action.
    """

    width: int = 10
    height: int = 20
    padding: int = 4
    queue_size: int = 7
    gravity_enabled: bool = True

    @property
    def padded_width(self) -> int:
        return self.width + 2 * self.padding

    @property
    def padded_height(self) -> int:
        return self.height + self.padding


class EngineConfig(NamedTuple):
    """Static config of the flagship engine (8 actions, holder, preview queue).

    The flagship engine unifies the reference's two engines: the OOP env's
    feature set (holder/swap, preview queue, ``(lines**2) * width`` scoring,
    ref: envs/tetris.py:621-630) in a pure-functional, batched form.

    Attributes:
        width/height/padding: board geometry (as in :class:`EnvConfig`).
        queue_size: preview queue length shown in observations
            (ref OOP default 4, components/tetromino_queue.py:13-22).
        holder_size: number of pieces the holder stores (ref default 1,
            components/tetromino_holder.py:15-22).
        gravity_enabled: gravity sub-step after each non-hard-drop action
            (ref: envs/tetris.py:259-264).
        auto_reset: when True, a terminated env is re-initialised on the next
            step on-device (no reference counterpart; required so RL rollouts
            never leave the device).
        queue_kind: piece randomizer — "bag" (7-bag, ref BagRandomizer,
            components/tetromino_randomizer.py:49-104) or "uniform"
            (ref TrueRandomizer, :105-136).  Static: selected at trace time.
    """

    width: int = 10
    height: int = 20
    padding: int = 4
    queue_size: int = 4
    holder_size: int = 1
    gravity_enabled: bool = True
    auto_reset: bool = False
    queue_kind: str = "bag"

    @property
    def padded_width(self) -> int:
        return self.width + 2 * self.padding

    @property
    def padded_height(self) -> int:
        return self.height + self.padding


@dataclasses.dataclass(frozen=True)
class ActionsMapping:
    """Action ids of the flagship engine / OOP shell.

    Values match the reference OOP mapping exactly
    (ref: mappings/actions.py:12-19).
    """

    move_left: int = 0
    move_right: int = 1
    move_down: int = 2
    rotate_clockwise: int = 3
    rotate_counterclockwise: int = 4
    hard_drop: int = 5
    swap: int = 6
    no_op: int = 7


@dataclasses.dataclass(frozen=True)
class RewardsMapping:
    """Reward shaping constants (ref: mappings/rewards.py:12-15)."""

    alife: float = 1
    clear_line: float = 1
    game_over: float = 0
    invalid_action: float = -0.1


# Action ids of the *compat* functional engine — 7 actions, no swap, and a
# different numbering from the OOP env (reference quirk,
# ref: envs/tetris_fn.py:470-478).
FN_ACTION_ID_TO_NAME = {
    0: "move_left",
    1: "move_right",
    2: "move_down",
    3: "rotate_counterclockwise",
    4: "rotate_clockwise",
    5: "do_nothing",
    6: "hard_drop",
}
