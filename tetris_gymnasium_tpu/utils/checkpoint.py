"""Checkpoint / resume for env-state pytrees and learner state.

The reference's checkpointing is `get_state`/`set_state` cloning on the OOP
env (ref: envs/tetris.py:681-708) plus `torch.save(state_dict)` in examples
(ref: examples/train_cnn.py:361-363).  Here any training state — env batch,
params, optimizer, PRNG keys — is one pytree, so checkpointing is a single
tree save/restore.  Uses orbax when available (the TPU-native checkpointer:
async, sharding-aware), with a numpy ``.npz`` fallback that round-trips any
array pytree.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

try:  # orbax is the first-choice backend (baked into the image)
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - environment without orbax
    _HAVE_ORBAX = False


def save(path: str, tree: Any) -> None:
    """Save an arbitrary array pytree to ``path`` (a directory)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, jax.device_get(tree), force=True)
        ckpt.wait_until_finished()
        return
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(jax.device_get(tree))
    np.savez(os.path.join(path, "leaves.npz"), *[np.asarray(l) for l in leaves])
    with open(os.path.join(path, "treedef.pkl"), "wb") as f:
        pickle.dump(treedef, f)


def restore(path: str, example: Any) -> Any:
    """Restore a pytree saved with :func:`save`.

    Args:
        example: a pytree with the target structure (and, for orbax, the
            target shapes/dtypes/shardings — pass an abstract or concrete
            template such as the freshly-initialised state).
    """
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(path, target=example)
    with open(os.path.join(path, "treedef.pkl"), "rb") as f:
        treedef = pickle.load(f)
    data = np.load(os.path.join(path, "leaves.npz"))
    leaves = [data[k] for k in data.files]
    return jax.tree.unflatten(treedef, leaves)
