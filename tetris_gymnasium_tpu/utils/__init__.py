"""Shared utilities: pytree select, compilation cache, checkpointing."""
from tetris_gymnasium_tpu.utils import profiling
from tetris_gymnasium_tpu.utils.checkpoint import restore, save
from tetris_gymnasium_tpu.utils.compilation import enable_persistent_cache
from tetris_gymnasium_tpu.utils.tree import select_tree

__all__ = ["enable_persistent_cache", "restore", "save", "select_tree"]
