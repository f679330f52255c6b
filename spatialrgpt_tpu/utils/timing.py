"""Timing helpers that work on tunneled/async backends.

On the axon-tunneled TPU platform ``block_until_ready`` does not actually
block, so wall-clock measurement must synchronize by fetching a (tiny)
scalar to the host.  Device executions are queued in order, so dispatching
N steps and fetching one scalar from the last result measures the whole
queue.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x=None) -> float:
    """Force completion of everything queued before ``x`` by fetching a
    scalar derived from it.  A leafless ``x`` (None, host-only result)
    still drains the queue: executions complete in order, so fetching a
    fresh tiny op fences all prior dispatches."""
    leaves = jax.tree_util.tree_leaves(x)
    leaf = leaves[0] if leaves else jnp.zeros(())
    return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median-free simple timing: dispatch ``iters`` runs back-to-back and
    sync once; returns seconds per iteration."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    # warmup=0 / leafless results still drain the queue (device_sync
    # fences all prior dispatches via a fresh tiny op)
    device_sync(out)
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.time() - t0) / iters
