"""Orbax checkpoint backend.

The npz backend (utils/checkpoint.py save_pytree/load_pytree) is the
default for small/local runs; this module provides the TPU-native
alternative for large-scale training: orbax StandardCheckpointer writes
asynchronously (training continues while the previous step's state
drains to storage) and records shardings, so multi-host restores place
shards directly on their devices.  Select with
``TrainerConfig(ckpt_backend="orbax")``.

Replaces the reference's DeepSpeed checkpoint engine + HF Trainer
save_steps machinery (SURVEY.md §5.4) on the TPU side.
"""

from __future__ import annotations

import os
from typing import Any, Optional

_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_pytree_orbax(path: str, tree: Any, wait: bool = False) -> None:
    """Async save of a pytree of (possibly sharded) arrays to ``path``
    (a directory).  Returns immediately; pass wait=True (or call
    wait_until_finished) to block."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_until_finished() -> None:
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def load_pytree_orbax(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved by save_pytree_orbax.  ``like`` (an abstract
    or concrete pytree) restores with matching dtypes/shardings; without
    it, arrays come back with their stored layout."""
    import jax

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    if like is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            like,
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def is_orbax_checkpoint(path: str) -> bool:
    """Orbax checkpoints are directories with a metadata file."""
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(path, "checkpoint"))
        or os.path.exists(os.path.join(path, "_METADATA"))
    )
