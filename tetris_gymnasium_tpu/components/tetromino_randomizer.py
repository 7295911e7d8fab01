"""Piece randomizers: host-side classes + pure-function device strategies.

API parity with the reference's pluggable randomizer classes
(ref: tetris_gymnasium/components/tetromino_randomizer.py:8-136), re-designed
for the TPU engine: the *semantics* of a randomizer live in a pure draw
function ``(bag, bag_index, key) -> (piece, bag, bag_index, key)`` that the
jitted step closes over (selected statically via ``EngineConfig.queue_kind``);
the classes here are the configuration-time handles users inject into the
Gymnasium shell (``Tetris(randomizer=...)``), and they double as standalone
host samplers with the reference's exact API (``get_next_tetromino`` /
``reset(seed)`` / ``__copy__``).

Custom strategies: subclass :class:`Randomizer`, implement ``draw`` as a pure
JAX function, and register it with :func:`register_randomizer`; the engine
dispatches on the registered name at trace time.
"""
from __future__ import annotations

from abc import abstractmethod
from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# -- pure device strategies ---------------------------------------------------

DrawFn = Callable[
    [jnp.ndarray, jnp.ndarray, jnp.ndarray],
    Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
]


def bag_draw(bag, bag_index, key):
    """7-bag draw: consume the bag, reshuffle on exhaustion.

    Device-pure form of the reference BagRandomizer
    (ref: components/tetromino_randomizer.py:67-87); the bag length (number
    of distinct pieces) is ``bag.shape[0]``, so custom piece sets work.

    RNG is the engine's counter-based stream (:mod:`ops.rng`): the reshuffle
    candidate is computed branch-free every call (masked execution), so the
    shuffle must be cheap — Fisher–Yates over one-hot swaps, ~150 VPU ops,
    vs a threefry ``jax.random.permutation`` which dominated round-1 step
    time.  The RNG state only advances when a refill actually happens.

    Shape-polymorphic: scalar-env form is ``bag [n]``, ``bag_index []``,
    ``key [2]``; the turbo engine calls it batch-minor with ``bag [n, B]``,
    ``bag_index [B]``, ``key [2, B]`` and gets the per-env-identical draws.
    """
    from tetris_gymnasium_tpu.ops import rng as orng

    n = bag.shape[0]
    need = bag_index >= n
    new_key, fresh = orng.shuffle(key, n)
    bag = jnp.where(need, fresh, bag)
    idx = jnp.where(need, 0, bag_index)
    lane = jnp.arange(n, dtype=jnp.int32).reshape((n,) + (1,) * jnp.ndim(idx))
    piece = jnp.sum(jnp.where(lane == idx, bag, 0), axis=0)
    key = jnp.where(need, new_key, key)
    return piece, bag, idx + 1, key


def uniform_draw(bag, bag_index, key):
    """Uniform i.i.d. draw over all pieces (ref TrueRandomizer,
    components/tetromino_randomizer.py:105-136); bag state passes through."""
    from tetris_gymnasium_tpu.ops import rng as orng

    key, piece = orng.randint(key, int(bag.shape[0]))
    return piece, bag, bag_index, key


_REGISTRY: dict = {"bag": bag_draw, "uniform": uniform_draw}


def register_randomizer(name: str, draw: DrawFn) -> None:
    """Register a custom pure draw strategy under ``name``.

    After registration, ``EngineConfig(queue_kind=name)`` (or
    ``Tetris(randomizer=<Randomizer with engine_kind=name>)``) selects it.
    The function must be trace-pure: no Python state, same signature as
    :func:`bag_draw`.

    Binding is at *trace time*: jitted engine programs are cached per
    ``EngineConfig``, so a program traced before a re-registration keeps the
    draw function it was traced with.  Re-registering an existing name warns
    for that reason (register custom strategies before stepping any env that
    uses them, and unregister in tests via :func:`unregister_randomizer`).
    """
    if name in _REGISTRY:
        import warnings

        warnings.warn(
            f"re-registering randomizer {name!r}: engine programs already "
            "traced with the previous strategy keep it (trace-time binding)",
            RuntimeWarning,
            stacklevel=2,
        )
    _REGISTRY[name] = draw


def unregister_randomizer(name: str) -> None:
    """Remove a registered strategy (no-op for unknown names; the built-in
    ``bag``/``uniform`` strategies cannot be removed)."""
    if name not in ("bag", "uniform"):
        _REGISTRY.pop(name, None)


def get_draw_fn(name: str) -> DrawFn:
    """Resolve a registered strategy (engine-internal)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown queue_kind {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


# -- host-side classes (reference API parity) ---------------------------------


class Randomizer:
    """Abstract randomizer: yields the *index* of the next piece.

    Host API parity with the reference base class
    (ref: components/tetromino_randomizer.py:8-46) including its seeding
    pattern: the seed is honored only on the first ``reset`` after
    construction.  ``engine_kind`` names the registered pure strategy the
    TPU engine uses when this randomizer is injected into the shell.
    """

    engine_kind: str = "bag"

    def __init__(self, size: int):
        self.size = size
        self.rng = None

    @abstractmethod
    def get_next_tetromino(self) -> int:
        """Return the index of the next piece (host-side sampling)."""

    def reset(self, seed=None):
        """Gymnasium-style seeding: only the first seeded reset re-keys."""
        if seed and seed > 0:
            self.rng = np.random.default_rng(np.random.SeedSequence(seed))
        elif self.rng is None:
            self.rng = np.random.default_rng()


class BagRandomizer(Randomizer):
    """7-bag randomizer (ref: components/tetromino_randomizer.py:49-104)."""

    engine_kind = "bag"

    def __init__(self, size: int):
        super().__init__(size)
        self.bag = np.arange(self.size, dtype=np.int8)
        self.index = 0

    def get_next_tetromino(self) -> int:
        piece = int(self.bag[self.index])
        self.index += 1
        if self.index >= len(self.bag):
            self.shuffle_bag()
        return piece

    def shuffle_bag(self):
        """Reshuffle in place and restart (ref: :82-87)."""
        self.rng.shuffle(self.bag)
        self.index = 0

    def reset(self, seed=None):
        """Re-seed (first call only) and reshuffle a fresh bag (ref: :89-92)."""
        super().reset(seed)
        self.bag = np.arange(self.size, dtype=np.int8)
        self.shuffle_bag()

    def __copy__(self) -> "BagRandomizer":
        new = BagRandomizer(self.size)
        new.rng = np.random.default_rng()
        new.rng.bit_generator.state = self.rng.bit_generator.state
        new.bag = self.bag.copy()
        new.index = self.index
        return new


class TrueRandomizer(Randomizer):
    """Uniform i.i.d. randomizer (ref: components/tetromino_randomizer.py:105-136)."""

    engine_kind = "uniform"

    def get_next_tetromino(self) -> int:
        return int(self.rng.integers(0, self.size))

    def reset(self, seed=None):
        """Only the RNG is (first-call) re-seeded; no other state exists."""
        super().reset(seed)

    def __copy__(self) -> "TrueRandomizer":
        new = TrueRandomizer(self.size)
        new.rng = np.random.default_rng()
        new.rng.bit_generator.state = self.rng.bit_generator.state
        return new
