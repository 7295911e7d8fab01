"""Counter-based per-env RNG for the flagship engine hot path.

The reference engines thread ``jax.random`` (threefry) keys through every
step — splits and 7-element ``jax.random.permutation`` calls per draw
(ref: tetris_gymnasium/functional/queue.py:38-67, envs/tetris_fn.py:388-399).
Under the flagship engine's branch-free masked execution those run
*unconditionally every step*, and threefry is ~20 rounds of ALU work per
split: measured, RNG was a double-digit share of step time on TPU.

This module is the TPU-native replacement: a per-env ``uint32[2]`` state
``(counter, stream)`` advanced as a 64-bit Weyl sequence, with outputs
whitened by the murmur3 finalizer (``fmix32``).  Properties:

  * ~15 VPU ops per draw — two orders of magnitude cheaper than a threefry
    split, and every op is a plain uint32 add/mul/xor/shift, so the exact
    same sequence is reproducible inside a Pallas kernel (no ``jax.random``
    dependency in kernels).
  * the state layout is ``uint32[2]`` — identical pytree shape to a legacy
    JAX PRNG key, so a ``jax.random.PRNGKey`` / ``fold_in`` product seeds an
    env directly and checkpoints keep their schema.
  * per-env streams: distinct seed words give distinct sequences; batches
    seeded by ``fold_in(base, global_env_index)`` stay placement-independent.

Statistical quality: fmix32 over a 64-bit counter is a standard avalanche
construction (full 64-bit period, passes practical avalanche tests); it is
not cryptographic and is meant for simulation only.

The *compat* engine (:mod:`tetris_gymnasium_tpu.core.fn_env`) keeps real
``jax.random`` threefry keys for bit-exact parity with the reference.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

# numpy scalars, NOT jnp: a module-level jnp constant would initialize the
# JAX backend at import time, which breaks multi-host bring-up (the backend
# must not exist before jax.distributed.initialize).  uint32 numpy scalars
# combine with uint32 arrays without promotion.
_GOLDEN = np.uint32(0x9E3779B9)  # Weyl increment (2**32 / phi)
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)


def fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 32-bit finalizer: full-avalanche bijective mixer."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 13)
    x = x * _M2
    x = x ^ (x >> 16)
    return x


def seed_key(word0, word1=0) -> jnp.ndarray:
    """Build an engine RNG state from two integer words."""
    return jnp.array([word0, word1], dtype=jnp.uint32)


def next_bits(key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Advance the state and emit one whitened uint32.

    ``key`` is ``uint32[2] = (counter, stream)``; the pair advances as one
    64-bit Weyl counter (carry propagates into the stream word), so the
    period is 2**64 regardless of seed.
    """
    key = key.astype(jnp.uint32)
    c0 = key[0] + _GOLDEN
    carry = (c0 < key[0]).astype(jnp.uint32)
    c1 = key[1] + carry
    out = fmix32(c0 ^ fmix32(c1))
    return jnp.stack([c0, c1]), out


def randint(key: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw a uniform int32 in ``[0, n)``; ``n`` is static and small.

    Multiply-shift on the top 16 bits: bias ≤ n/65536 (≈1e-4 for n=7),
    division-free.  Not for large ``n``.
    """
    key, bits = next_bits(key)
    hi = (bits >> 16).astype(jnp.uint32)
    return key, ((hi * jnp.uint32(n)) >> 16).astype(jnp.int32)


def shuffle(key: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform random permutation of ``arange(n)`` (static ``n``).

    Fisher–Yates, statically unrolled (n-1 draws), with the dynamic-index
    swap expressed as one-hot arithmetic so the whole shuffle is branch-free
    vector code under ``vmap`` (no scatters).

    Shape-polymorphic: ``key`` may carry trailing batch dims — ``uint32[2]``
    returns ``int32[n]``; ``uint32[2, B]`` returns ``int32[n, B]`` with per-env
    draw sequences identical to ``n`` independent scalar shuffles (the turbo
    engine's batch-minor layout relies on this for trajectory equivalence
    with the per-env flagship engine).
    """
    key = jnp.asarray(key, dtype=jnp.uint32)
    batch = key.shape[1:]
    idx = jnp.arange(n, dtype=jnp.int32).reshape((n,) + (1,) * len(batch))
    perm = jnp.broadcast_to(idx, (n,) + batch)
    for i in range(n - 1, 0, -1):
        key, j = randint(key, i + 1)
        vi = perm[i]
        oh_j = idx == j
        vj = jnp.sum(jnp.where(oh_j, perm, 0), axis=0)
        perm = jnp.where(oh_j, vi, perm)
        perm = perm.at[i].set(vj)
    return key, perm


def uniform(key: jnp.ndarray, shape=()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform float32 in [0, 1); draws ``prod(shape)`` words sequentially."""
    import numpy as np

    count = int(np.prod(shape)) if shape else 1
    outs = []
    for _ in range(count):
        key, bits = next_bits(key)
        outs.append(bits)
    vals = jnp.stack(outs).astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
    return key, vals.reshape(shape) if shape else vals[0]
