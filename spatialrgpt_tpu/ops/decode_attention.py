"""Fused int8-KV flash-decode kernel (Pallas).

Decode attention is pure HBM bandwidth: per step each layer streams the
whole KV cache once against a single query token.  The XLA path
(serving/generate.py ``_cached_attention_quant``) measured ~60% of the
chip's practical stream rate (BASELINE.md); this kernel reads the cache
as int8 directly into VMEM, dequantizes in registers, and fuses
scores -> masked softmax -> PV into one pass so no intermediate ever
touches HBM.

Cache layout is head-major ``(B, Hk, C, D)`` int8 with per-position
scales ``(B, Hk, C)`` f32 — (C, D) tiles are exactly (sublane, lane)
shaped, so DMA is dense (the token-major layout would pad Hk=20 up to
the 32-sublane int8 tile).  Grid is (B,); heads loop statically inside,
with GQA handled by blocking ``n_rep`` query heads per KV head (an
(n_rep, C) x (C, D) matmul keeps the MXU shapes sane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, out_ref, *, n_rep, scale):
    q = q_ref[0]  # (Hq, D) bf16
    bias = bias_ref[0, 0].astype(jnp.float32)  # (C,)
    Hk = kq_ref.shape[1]
    for h in range(Hk):
        k = kq_ref[0, h].astype(q.dtype)  # (C, D) int8 -> bf16 in VMEM
        ks = ks_ref[0, h].astype(jnp.float32)  # (C,)
        qg = q[h * n_rep : (h + 1) * n_rep]  # (n_rep, D)
        s = jax.lax.dot_general(
            qg, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_rep, C)
        s = s * (ks * scale)[None, :] + bias[None, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        vs = vs_ref[0, h].astype(jnp.float32)  # (C,)
        pv = (p * vs[None, :]).astype(q.dtype)  # fold V scales into probs
        v = vq_ref[0, h].astype(q.dtype)  # (C, D)
        o = jax.lax.dot_general(
            pv, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_rep, D)
        out_ref[0, h * n_rep : (h + 1) * n_rep] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_int8(
    q: jax.Array,  # (B, Hq, D) bf16 (single new token per row)
    k_q: jax.Array,  # (B, Hk, C, D) int8
    k_s: jax.Array,  # (B, Hk, C) f32
    v_q: jax.Array,  # (B, Hk, C, D) int8
    v_s: jax.Array,  # (B, Hk, C) f32
    bias: jax.Array,  # (B, C) f32 additive mask (0 valid / -inf-ish invalid)
    interpret: bool = False,
) -> jax.Array:  # (B, Hq, D)
    B, Hq, D = q.shape
    Hk, C = k_q.shape[1], k_q.shape[2]
    n_rep = Hq // Hk
    kernel = functools.partial(_decode_kernel, n_rep=n_rep, scale=D**-0.5)
    kv_spec = pl.BlockSpec((1, Hk, C, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, Hk, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            kv_spec,
            s_spec,
            kv_spec,
            s_spec,
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * C * D,
            bytes_accessed=2 * B * Hk * C * D + 2 * 4 * B * Hk * C + 2 * B * Hq * D,
            transcendentals=B * Hq * C,
        ),
    )(q, k_q, k_s, v_q, v_s, bias[:, None, :])
