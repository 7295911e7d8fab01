"""Pluggable game components (piece model, queue, holder, randomizers).

The reference exposes these as stateful OOP objects wired into its env
(ref: tetris_gymnasium/components/); here they are configuration-time
handles + pure device strategies: injecting them into the Gymnasium shell
configures the jitted engine, and each class is also usable standalone with
the reference's exact host API.
"""
from tetris_gymnasium_tpu.components.tetromino import (
    BASE_PIXELS,
    Pixel,
    Tetromino,
    default_tetrominoes,
    pieces_from_tetrominoes,
)
from tetris_gymnasium_tpu.components.tetromino_holder import TetrominoHolder
from tetris_gymnasium_tpu.components.tetromino_queue import TetrominoQueue
from tetris_gymnasium_tpu.components.tetromino_randomizer import (
    BagRandomizer,
    Randomizer,
    TrueRandomizer,
    bag_draw,
    get_draw_fn,
    register_randomizer,
    unregister_randomizer,
    uniform_draw,
)

__all__ = [
    "BASE_PIXELS",
    "Pixel",
    "Tetromino",
    "default_tetrominoes",
    "pieces_from_tetrominoes",
    "TetrominoHolder",
    "TetrominoQueue",
    "Randomizer",
    "BagRandomizer",
    "TrueRandomizer",
    "bag_draw",
    "uniform_draw",
    "register_randomizer",
    "unregister_randomizer",
    "get_draw_fn",
]
