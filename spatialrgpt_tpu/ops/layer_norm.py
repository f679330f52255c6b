"""Fused one-pass LayerNorm (Pallas, TPU).

The XLA LayerNorm at ViT serving shapes decomposes into separate
mean/variance reduce fusions plus a normalize fusion, each re-streaming
the full (tokens, C) activation from HBM — the r4 xplane profile shows
those per-token reduce chains at ~210 ms of the 725 ms tower pass
(2 LN sites x 26 layers x ~226 MB reads each).  This kernel computes
mean, variance, and the normalized output in ONE pass over each row
block: one read + one write per site.

Numerics match ops/layers.layer_norm (f32 statistics, scale/bias applied
in f32, cast to the input dtype) — gated by an interpret-mode equality
test; the XLA path remains the CPU/non-bf16 fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (bq, C)
    m = jnp.mean(x, axis=1, keepdims=True)
    d = x - m
    v = jnp.mean(d * d, axis=1, keepdims=True)
    y = d * jax.lax.rsqrt(v + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_layer_norm(
    x: jax.Array,  # (..., C)
    scale: jax.Array,  # (C,)
    bias: jax.Array,  # (C,)
    eps: float = 1e-6,
    block_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One-pass LayerNorm over the last axis.  Rows must tile evenly into
    ``block_rows`` after flattening (callers at serving shapes satisfy
    this; otherwise fall back to the XLA path)."""
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    bq = block_rows
    while rows % bq:
        bq //= 2
    xf = x.reshape(rows, C)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(rows // bq,),
        in_specs=[
            pl.BlockSpec((bq, C), lambda i: (i, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bq, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xf, scale, bias)
    return out.reshape(orig_shape)
