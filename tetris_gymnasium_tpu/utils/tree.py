"""Small pytree utilities shared across the engine."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def select_tree(pred, on_true, on_false):
    """Elementwise ``where`` over two pytrees with identical structure.

    The TPU-friendly replacement for ``lax.cond`` when both branches are
    cheap: under vmap a cond lowers to a select anyway, so computing both
    branches and selecting is the same math without the control-flow overhead.
    """
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)
