"""Layout-specialized Pallas attention for ViT towers (fwd-only).

The SigLIP so400m tower (27 layers, S=729, H=16, D=72) spends its
attention time badly in both generic paths:

  - XLA materializes the (B, H, S, S) score tensor in HBM (~2.2 GB f32 at
    batch 64) and is bandwidth-bound (~9 ms/layer);
  - the generic flash kernel (ops/flash_attention.py) carries online-
    softmax state, an LSE output, f32 matmul inputs, and a 2D segment-id
    mask — all unnecessary when the whole 768-padded sequence fits a
    single kv block (~6.6 ms/layer at batch 64, VPU/overhead-bound).

This kernel exploits the ViT shape directly (reference counterpart:
the flash-attn CUDA wheel behind HF SiglipAttention,
llava/model/multimodal_encoder/siglip/modeling_siglip.py):

  - non-causal, whole-sequence kv: ONE pass, plain softmax (no m/l
    rescale chain, no LSE output);
  - bf16 MXU inputs with f32 accumulation (identical numerics to
    upcasting bf16 values to f32, at 4x the MXU issue rate);
  - padding handled by a per-program (1, S) additive bias row instead of
    a (bq, bk) bool mask: zero-padded keys score NEG_INF and vanish in
    the exp — no second `where`;
  - `block_h` heads per program to amortize grid overhead; grid is just
    (B, H/block_h).

The kernel itself is forward-only; a custom VJP recomputes the softmax
attention backward in plain XLA (towers are frozen in serving and SFT,
so the backward only runs in the rare unfreeze-tower training configs,
where batch sizes are small enough for the materialized score tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, out_ref, *, sm_scale: float, valid_len: int,
            block_h: int):
    s_pad = k_ref.shape[2]
    # additive key-padding bias, computed once per program: (1, S)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    bias = jnp.where(cols < valid_len, 0.0, NEG_INF).astype(jnp.float32)
    for h in range(block_h):
        q = q_ref[0, h]  # (bq, D) bf16
        k = k_ref[0, h]  # (S, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (S, S) f32, bf16 MXU inputs
        s = s * sm_scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)  # padded cols underflow to exactly 0
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out_ref[0, h] = (o / l).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _vit_attn(q, k, v, sm_scale, block_h, block_q, interpret, valid_len):
    B, S, H, D = q.shape
    s_pad = ((S + 127) // 128) * 128
    pad = s_pad - S
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))

    bq = min(block_q or s_pad, s_pad)
    while s_pad % bq:
        bq //= 2
    # q/out blocked over the innermost grid dim; k/v whole-sequence blocks
    # whose index is constant across q steps (fetched once per (b, h))
    qspec = pl.BlockSpec((1, block_h, bq, D), lambda b, h, i: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, block_h, s_pad, D), lambda b, h, i: (b, h, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, valid_len=valid_len or S,
            block_h=block_h,
        ),
        grid=(B, H // block_h, s_pad // bq),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.transpose(out[:, :, :S], (0, 2, 1, 3))


def _nt_kernel(q_ref, k_ref, v_ref, out_ref, *, sm_scale: float,
               valid_len: int, block_h: int):
    """Layout-native kernel: blocks are (1, bq|S, block_h, D) slices of
    the (B, S, H, D) tensors — no XLA transpose/pad around the call (the
    r4 profile put those at ~200 ms of the 725 ms tower)."""
    s_pad = k_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    bias = jnp.where(cols < valid_len, 0.0, NEG_INF).astype(jnp.float32)
    for h in range(block_h):
        q = q_ref[0, :, h]  # (bq, D) bf16
        k = k_ref[0, :, h]  # (S, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, :, h],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out_ref[0, :, h] = (o / l).astype(out_ref.dtype)


def _vit_attn_nt(q, k, v, sm_scale, block_h, block_q, interpret, valid_len):
    """No-transpose variant: q/k/v stay (B, S, H, D); S must already be a
    lane multiple (the pad-once tower path guarantees it)."""
    B, S, H, D = q.shape
    assert S % 128 == 0, "pad-once required for the nt kernel"
    bq = min(block_q or S, S)
    while S % bq:
        bq //= 2
    qspec = pl.BlockSpec((1, bq, block_h, D), lambda b, h, i: (b, i, h, 0))
    kvspec = pl.BlockSpec((1, S, block_h, D), lambda b, h, i: (b, 0, h, 0))
    return pl.pallas_call(
        functools.partial(
            _nt_kernel, sm_scale=sm_scale, valid_len=valid_len or S,
            block_h=block_h,
        ),
        grid=(B, H // block_h, S // bq),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)


def _xla_probs(q, k, sm_scale, valid_len=None):
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if valid_len and valid_len != k.shape[1]:
        # pad-once callers: keys beyond the true length are masked with
        # the same bias the forward kernel applies
        cols = jnp.arange(k.shape[1])
        s = jnp.where(cols[None, None, None, :] < valid_len, s, NEG_INF)
    return jax.nn.softmax(s, axis=-1)


def _vit_attn_fwd(q, k, v, sm_scale, block_h, block_q, interpret, valid_len):
    return (
        _vit_attn(q, k, v, sm_scale, block_h, block_q, interpret, valid_len),
        (q, k, v),
    )


def _vit_attn_bwd(sm_scale, block_h, block_q, interpret, valid_len, res, do):
    """XLA-recompute backward; supports the pad-once (valid_len) path:
    padded keys carry zero probability, so their dk/dv come out exactly
    zero and dq for padded rows is the gradient of a masked softmax —
    consistent with the forward kernel's bias masking (advisor r4: the
    earlier NotImplementedError crashed tune_vision_tower=True training
    on TPU bf16, where pad-once is the default)."""
    q, k, v = res
    p = _xla_probs(q, k, sm_scale, valid_len)  # (B, H, Sq, Sk) f32
    dof = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, dof).astype(v.dtype)
    dp = jnp.einsum("bqhd,bkhd->bhqk", dof, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32)) * sm_scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32)) * sm_scale).astype(k.dtype)
    return dq, dk, dv


_vit_attn.defvjp(_vit_attn_fwd, _vit_attn_bwd)


def vit_attention(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,
    v: jax.Array,
    sm_scale: float | None = None,
    block_h: int = 8,
    block_q: int | None = None,
    interpret: bool = False,
    valid_len: int | None = None,
) -> jax.Array:
    """Bidirectional whole-sequence attention; returns (B, S, H, D).

    S may be ragged (e.g. 729): inputs are zero-padded to a lane multiple
    in-kernel and the padded keys are masked out via the score bias.
    Callers that pre-pad the sequence to a lane multiple THEMSELVES (the
    pad-once tower path — r4 profile: 26x3 per-layer pad ops were ~12%
    of the tower) pass the true length as ``valid_len``; keys beyond it
    are masked identically to the in-kernel padding.
    ``block_q`` bounds the q rows per program (defaults to the whole
    sequence; smaller blocks trade grid steps for VMEM so more heads fit).
    Differentiable (XLA-recompute backward; unpadded path only).
    """
    H, D = q.shape[2], q.shape[3]
    if sm_scale is None:
        sm_scale = D**-0.5
    while H % block_h:
        block_h //= 2
    import os

    if (
        os.environ.get("SRGPT_VIT_NT", "0") == "1"
        and q.shape[1] % 128 == 0
        and H % 8 == 0
    ):
        # layout-native experiment (no transpose/pad around the kernel —
        # the r4 xplane profile put those XLA copies at ~200 ms of the
        # 725 ms tower).  Numerics are bit-identical to the transposed
        # kernel (interpret-tested), but Mosaic currently REJECTS the
        # per-head slice of a (bq, 8, 72) block ("infer-vector-layout:
        # unsupported shape cast"), so on real TPUs the gate falls back
        # with a warning instead of dispatching into a compile error
        # (advisor r4) — parked until the toolchain accepts it.
        from spatialrgpt_tpu.ops.flash_attention import _on_tpu

        if interpret or not _on_tpu():
            return _vit_attn_nt(q, k, v, sm_scale, 8, block_q, interpret, valid_len)
        import warnings

        warnings.warn(
            "SRGPT_VIT_NT=1: the layout-native ViT kernel does not compile "
            "on current Mosaic; using the transposed kernel instead"
        )
    return _vit_attn(q, k, v, sm_scale, block_h, block_q, interpret, valid_len)
