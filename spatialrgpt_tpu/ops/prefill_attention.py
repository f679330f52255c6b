"""One-pass causal Pallas attention for serving-prefill shapes.

The serving prefill (S = 384-token bucket) spends more time in attention
overhead than in attention math on both generic paths (measured,
scripts/bench_prefill.py at the llama3-8b b64 shape):

  - the XLA path materializes the (B, Hk, G, S, S) f32 score tensor in
    HBM (1.2 GB/layer at b64) and re-streams it through mask/softmax —
    ~16-23 ms/layer against a ~1 ms matmul floor;
  - the generic flash kernel (ops/flash_attention.py) pays the online-
    softmax m/l rescale chain, an LSE output, and a 2D segment-id mask
    per kv block — machinery for long sequences that a 384-token bucket
    never needs.

This kernel is the causal sibling of ops/vit_attention.py: the whole
(padded) key sequence is one kv block per program, so softmax is a
single plain pass (no running-max chain, no LSE), matmul inputs stay
bf16 (f32 accumulation — identical numerics to the XLA einsum path),
and the causal x segment mask is one additive f32 bias computed from
two iotas + the segment-id row per program.  GQA runs natively: the
grid is (B, Hk, S/bq) and each program computes the G = Hq/Hk query
heads that share its kv head, so K/V stream at kv-head width (the same
grouped-einsum trick the XLA paths use).

Forward-only in-kernel; a custom VJP recomputes the masked softmax in
plain XLA for the training configs (packed segments included), so the
kernel is usable for short-sequence training steps too.

Reference counterpart: the flash-attn CUDA wheel's causal/varlen path
(flash_attn_varlen_func behind transformers_replace modeling_llama.py's
seqlens plumbing).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    bias_ref,  # (1, bq, S) f32 additive mask (0 valid / NEG_INF masked)
    q_ref,  # (1, 1, G, bq, D)
    k_ref,  # (1, 1, S, D)
    v_ref,  # (1, 1, S, D)
    out_ref,  # (1, 1, G, bq, D)
    *,
    sm_scale: float,
    g: int,
    fold_g: bool,
):
    bias = bias_ref[0]  # (bq, S)
    k = k_ref[0, 0]  # (S, D) bf16
    v = v_ref[0, 0]
    if fold_g:
        # one (G*bq, D) x (D, S) matmul instead of G small ones: the
        # grouped query heads share this program's kv head, so they fold
        # into the matmul M dimension (kernel 6.84 -> 5.74 ms/layer at
        # the 8B b64/S384 serving shape — BASELINE.md r3)
        bq, d = q_ref.shape[3], q_ref.shape[4]
        q = q_ref[0, 0].reshape(g * bq, d)  # (G*bq, D) bf16
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s.reshape(g, bq, -1) * sm_scale + bias[None]
        m = jnp.max(s, axis=2, keepdims=True)  # (G, bq, 1)
        # rows with no valid key at all (segment-id 0 padding) have
        # m == NEG_INF; zero them at the end like the XLA path does
        live = (m > NEG_INF * 0.5).astype(jnp.float32)
        p = jnp.exp(s - m)  # masked cols underflow to exactly 0
        l = jnp.sum(p, axis=2, keepdims=True)
        o = jax.lax.dot_general(
            p.reshape(g * bq, -1).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, 0] = (o.reshape(g, bq, d) / l * live).astype(out_ref.dtype)
        return
    for h in range(g):
        q = q_ref[0, 0, h]  # (bq, D) bf16
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        live = (m > NEG_INF * 0.5).astype(jnp.float32)  # (bq, 1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, 0, h] = (o / l * live).astype(out_ref.dtype)


def _xla_reference(q, k, v, segment_ids, sm_scale, window):
    """Masked-softmax attention in plain XLA (the VJP recompute path and
    the numerical oracle for tests)."""
    b, s, hq, d = q.shape
    hk = k.shape[2]
    gsz = hq // hk
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    same = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
        segment_ids[:, :, None] != 0
    )
    qi = jnp.arange(s)[:, None]
    ki = jnp.arange(s)[None, :]
    ok = same & (qi >= ki)[None]
    if window is not None:
        ok &= ((qi - ki) < window)[None]
    qg = q.reshape(b, s, hk, gsz, d)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = scores * sm_scale
    scores = jnp.where(ok[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    probs = probs * (segment_ids != 0)[:, None, None, :, None].astype(probs.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, s, hq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _onepass(q, k, v, segment_ids, sm_scale, window, block_q, interpret, fold_g):
    B, S, Hq, D = q.shape
    Hk = k.shape[2]
    G = Hq // Hk
    s_pad = ((S + 127) // 128) * 128
    pad = s_pad - S

    seg = segment_ids
    if seg is None:
        seg = jnp.ones((B, S), jnp.int32)
    seg = seg.astype(jnp.int32)
    if pad:
        seg = jnp.pad(seg, ((0, 0), (0, pad)))  # padded tail: segment 0

    # additive mask built once in XLA — (B, S, S) f32 is small at prefill
    # buckets (37 MB at b64/S384) and CSEs across every decoder layer
    same = (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] != 0)
    qi = jnp.arange(s_pad)[:, None]
    ki = jnp.arange(s_pad)[None, :]
    ok = same & (qi >= ki)[None]
    if window is not None:
        ok &= ((qi - ki) < window)[None]
    bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)

    # (B, Hk, G, S, D) query / (B, Hk, S, D) kv layouts
    qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(B, Hk, G, S, D)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))

    # default q block: whole bucket for short S, shrunk for long S so the
    # (bq, S) f32 score + bias tiles stay within VMEM
    bq = min(block_q or min(512, max(128, (1 << 20) // s_pad)), s_pad)
    while s_pad % bq:
        bq //= 2

    qspec = pl.BlockSpec((1, 1, G, bq, D), lambda b, h, i: (b, h, 0, i, 0))
    kvspec = pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0))
    bspec = pl.BlockSpec((1, bq, s_pad), lambda b, h, i: (b, i, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, g=G, fold_g=fold_g),
        grid=(B, Hk, s_pad // bq),
        in_specs=[bspec, qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(bias, qt, kt, vt)
    out = out.reshape(B, Hq, s_pad, D)[:, :, :S]
    return jnp.transpose(out, (0, 2, 1, 3))


def _onepass_fwd(q, k, v, segment_ids, sm_scale, window, block_q, interpret, fold_g):
    out = _onepass(q, k, v, segment_ids, sm_scale, window, block_q, interpret, fold_g)
    return out, (q, k, v, segment_ids)


def _onepass_bwd(sm_scale, window, block_q, interpret, fold_g, res, do):
    q, k, v, segment_ids = res
    b, s, hq, d = q.shape
    hk = k.shape[2]
    gsz = hq // hk
    if segment_ids is None:
        seg = jnp.ones((b, s), jnp.int32)
    else:
        seg = segment_ids
    same = (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] != 0)
    qi = jnp.arange(s)[:, None]
    ki = jnp.arange(s)[None, :]
    ok = same & (qi >= ki)[None]
    if window is not None:
        ok &= ((qi - ki) < window)[None]
    qg = q.reshape(b, s, hk, gsz, d)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = jnp.where(ok[:, None, None], scores * sm_scale, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    p = p * (seg != 0)[:, None, None, :, None].astype(p.dtype)

    dog = do.reshape(b, s, hk, gsz, d).astype(jnp.float32)
    dv = jnp.einsum("bhgqk,bqhgd->bkhd", p, dog).astype(v.dtype)
    dp = jnp.einsum("bqhgd,bkhd->bhgqk", dog, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (
        jnp.einsum("bhgqk,bkhd->bqhgd", ds, k.astype(jnp.float32)) * sm_scale
    ).reshape(b, s, hq, d).astype(q.dtype)
    dk = (
        jnp.einsum("bhgqk,bqhgd->bkhd", ds, qg.astype(jnp.float32)) * sm_scale
    ).astype(k.dtype)
    dseg = None if segment_ids is None else jnp.zeros_like(segment_ids)
    return dq, dk, dv, dseg


_onepass.defvjp(_onepass_fwd, _onepass_bwd)


def onepass_attention(
    q: jax.Array,  # (B, S, Hq, D)
    k: jax.Array,  # (B, S, Hk, D)
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,  # (B, S); 0 = padding
    window: Optional[int] = None,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
    fold_g: bool = True,
) -> jax.Array:
    """Causal (packed-segment, optionally sliding-window) attention with a
    single softmax pass per q block — for short serving/prefill buckets
    where the whole key sequence fits one kv block.  GQA-native.
    Differentiable via an XLA-recompute VJP."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    return _onepass(q, k, v, segment_ids, sm_scale, window, block_q, interpret, fold_g)
