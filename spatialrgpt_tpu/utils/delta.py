"""Base/delta weight tools.

Rebuild of the reference's checkpoint utilities (llava/model/apply_delta.py,
make_delta.py, consolidate.py): delta checkpoints store (finetuned - base)
so released weights can exclude licensed base models; consolidate merges
sharded/raw trainer output into a clean composite directory.
Operates on our pytrees (utils/checkpoint.py converters handle the HF
side)."""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _binary_op(a, b, op):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert len(la) == len(lb), "tree structure mismatch"
    out = []
    for x, y in zip(la, lb):
        if x.shape != y.shape:
            # vocab-size growth: pad the smaller along dim 0 with zeros
            # (reference apply_delta handles embed size mismatch the same way)
            rows = max(x.shape[0], y.shape[0])
            x = _pad_rows(x, rows)
            y = _pad_rows(y, rows)
        out.append(op(x, y))
    return jax.tree_util.tree_unflatten(ta, out)


def _pad_rows(x, rows):
    if x.shape[0] == rows:
        return x
    pad = jnp.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def make_delta(base_params: Dict, target_params: Dict) -> Dict:
    """delta = target - base."""
    return _binary_op(target_params, base_params, lambda t, b: t - b)


def apply_delta(base_params: Dict, delta_params: Dict) -> Dict:
    """target = base + delta."""
    return _binary_op(base_params, delta_params, lambda b, d: b + d)


def consolidate(checkpoint_dir: str, out_dir: str, cfg) -> None:
    """Trainer checkpoint (state.npz pytree) -> composite HF-layout dir."""
    from spatialrgpt_tpu.utils.checkpoint import load_pytree
    from spatialrgpt_tpu.utils.export import save_composite

    params = load_pytree(os.path.join(checkpoint_dir, "state.npz"))
    save_composite(out_dir, jax.device_get(params), cfg)
