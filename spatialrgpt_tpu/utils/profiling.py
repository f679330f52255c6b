"""Profiling / tracing helpers.

The reference's observability is torch.profiler imports and NVTX ranges
(SURVEY.md S5.1); TPU-native equivalent: jax.profiler traces viewable in
Perfetto/TensorBoard, named trace annotations, simple wall-clock scopes,
and a memory report."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace for the enclosed block (Perfetto viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range inside a trace (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def stopwatch(name: str, sink: Optional[Dict] = None):
    t0 = time.time()
    yield
    dt = time.time() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    else:
        print(f"[stopwatch] {name}: {dt*1e3:.2f} ms")


def device_memory_report() -> Dict:
    """Per-device live-buffer stats (the TPU analogue of the reference's
    pre-train GPU memory print, train.py:748-752)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out


# rank-aware printing (reference train/utils.py:17-35 mprint/rprint)
def mprint(*args, **kwargs):
    """Print only on process 0."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


def rprint(*args, **kwargs):
    """Print with process prefix."""
    print(f"[rank {jax.process_index()}]", *args, **kwargs)
