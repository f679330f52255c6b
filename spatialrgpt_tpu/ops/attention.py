"""Attention ops with interchangeable implementations.

``causal_attention`` is the training/prefill path: causal within packed
segments (the TPU-static replacement for the reference's
flash_attn_varlen_func + cu_seqlens path, transformers_replace
modeling_llama.py:509-568).  ``decode_attention`` is the single/multi-token
decode path against a static KV cache.

impl="xla" is the reference XLA implementation (fused by the compiler);
impl="pallas" routes to the Pallas flash kernel (ops/flash_attention.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _repeat_kv(k: jax.Array, n_rep: int) -> jax.Array:
    """(B, S, Hk, D) -> (B, S, Hk*n_rep, D) by head-group repetition."""
    if n_rep == 1:
        return k
    b, s, hk, d = k.shape
    k = jnp.broadcast_to(k[:, :, :, None, :], (b, s, hk, n_rep, d))
    return k.reshape(b, s, hk * n_rep, d)


def make_attention_mask(
    q_segment_ids: jax.Array,  # (B, S)
    kv_segment_ids: jax.Array,  # (B, T)
    causal: bool = True,
) -> jax.Array:
    """(B, 1, S, T) boolean mask: same nonzero segment, causal in-position.

    Positions with segment id 0 are padding and attend nowhere / are
    attended by nothing.
    """
    same = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]) & (
        q_segment_ids[:, :, None] != 0
    )
    if causal:
        s, t = q_segment_ids.shape[1], kv_segment_ids.shape[1]
        qi = jnp.arange(s)[:, None]
        ki = jnp.arange(t)[None, :]
        same = same & (qi >= ki)[None, :, :]
    return same[:, None, :, :]


def causal_attention(
    q: jax.Array,  # (B, S, Hq, D)
    k: jax.Array,  # (B, S, Hk, D)
    v: jax.Array,  # (B, S, Hk, D)
    segment_ids: Optional[jax.Array] = None,  # (B, S), 0 = padding
    impl: str = "xla",
    window: Optional[int] = None,  # sliding-window attention (mistral)
) -> jax.Array:
    if impl == "pallas":
        import os

        from spatialrgpt_tpu.ops.flash_attention import flash_attention

        # bwd-kernel block overrides (trace-time env knobs for the training
        # block sweep, scripts/bench_train_attn.py / BASELINE.md)
        bqb = int(os.environ.get("SRGPT_FLASH_BQ_BWD", 0)) or None
        bkb = int(os.environ.get("SRGPT_FLASH_BK_BWD", 0)) or None
        return flash_attention(
            q, k, v, segment_ids=segment_ids, causal=True, window=window,
            block_q_bwd=bqb, block_k_bwd=bkb,
        )
    if impl == "onepass":
        # short-bucket serving prefill: single-softmax-pass kernel with
        # whole-sequence kv blocks (ops/prefill_attention.py) — no HBM
        # score tensor, no online-softmax chain.  XLA fallback off-TPU.
        from spatialrgpt_tpu.ops.flash_attention import _on_tpu

        if _on_tpu():
            from spatialrgpt_tpu.ops.prefill_attention import onepass_attention

            return onepass_attention(q, k, v, segment_ids=segment_ids, window=window)
        impl = "xla"
    if impl in ("ulysses", "ring", "hybrid"):
        return _sp_attention(q, k, v, segment_ids, impl)
    if impl != "xla":
        raise ValueError(f"unknown attention impl: {impl}")

    b, s, hq, d = q.shape
    hk = k.shape[2]
    if segment_ids is None:
        mask = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
    else:
        mask = make_attention_mask(segment_ids, segment_ids, causal=True)
    if window is not None:
        qi = jnp.arange(s)[:, None]
        ki = jnp.arange(s)[None, :]
        mask = mask & ((qi - ki) < window)[None, None]

    if hq == hk:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d**-0.5)
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        # rows that attend to nothing (padding) produce uniform probs; zero them
        if segment_ids is not None:
            probs = probs * (segment_ids != 0)[:, None, :, None].astype(probs.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    # GQA: grouped einsums keep the KV read at Hk heads instead of
    # materializing the n_rep head repeat (4x HBM for llama3-8b)
    g = hq // hk
    qg = q.reshape(b, s, hk, g, d)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = scores * (d**-0.5)
    scores = jnp.where(mask[:, :, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    if segment_ids is not None:
        probs = probs * (segment_ids != 0)[:, None, None, :, None].astype(probs.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, s, hq, d)


def _sp_attention(q, k, v, segment_ids, impl):
    """Sequence-parallel attention: shard_map over the SP mesh axes from
    the ambient SPContext (parallel/context.py).  Inputs are global-shaped
    (inside jit); shard_map splits the sequence axis across devices."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from spatialrgpt_tpu.parallel.context import get_sp_context

    ctx = get_sp_context()
    if ctx is None:
        raise RuntimeError(f"attn impl '{impl}' requires set_sp_context(...)")

    if impl == "hybrid":
        from spatialrgpt_tpu.parallel.hybrid import hybrid_attention

        axes = (ctx.ring_axis, ctx.ulysses_axis)
        fn = lambda q, k, v, s: hybrid_attention(
            q, k, v, s, ulysses_axis=ctx.ulysses_axis, ring_axis=ctx.ring_axis
        )
    elif impl == "ulysses":
        from spatialrgpt_tpu.parallel.ulysses import ulysses_attention

        axes = ctx.ulysses_axis
        fn = lambda q, k, v, s: ulysses_attention(
            q, k, v, s, axis_name=ctx.ulysses_axis, impl=ctx.inner_impl
        )
    else:
        from spatialrgpt_tpu.parallel.ring import ring_attention

        axes = ctx.ring_axis
        fn = lambda q, k, v, s: ring_attention(q, k, v, s, axis_name=ctx.ring_axis)

    spec4 = P(None, axes, None, None)
    spec2 = P(None, axes)
    if segment_ids is None:
        segment_ids = jnp.ones(q.shape[:2], jnp.int32)
    return shard_map(
        fn,
        mesh=ctx.mesh,
        in_specs=(spec4, spec4, spec4, spec2),
        out_specs=spec4,
        check_vma=False,
    )(q, k, v, segment_ids)


def streamed_position_attention(
    q: jax.Array,  # (R, c, Hq, D) one prompt chunk per row
    k_buf: jax.Array,  # (R, Sp, Hk, D) staged prompt K (earlier chunks + this one)
    v_buf: jax.Array,  # (R, Sp, Hk, D)
    q_idx: jax.Array,  # (R, c) int32 buffer index of each q token
    block: int = 512,
) -> jax.Array:
    """Chunked-prefill attention: each row's chunk attends to its own
    staged prompt buffer at positions <= the token's buffer index.

    The fused serving engine step (serving/engine.py) runs prompt chunks
    of admitting requests beside the decode batch; this is the chunk
    side's attention.  Two paths:

    - ``Sp <= block``: single-shot masked softmax with the SAME op order
      as ``decode_attention`` (probs normalized before PV) so chunked
      admission is bit-equal to unchunked on exact-arithmetic backends
      (the CPU parity tests pin token equality).
    - otherwise: blocked online-softmax streaming over ``Sp`` (flash
      schedule in XLA), with the block loop bounded by the furthest
      attended key across rows — trailing never-written blocks are
      skipped, so early chunks pay only for the prefix that exists.
    """
    R, c, hq, d = q.shape
    Sp, hk = k_buf.shape[1], k_buf.shape[2]
    g = hq // hk
    qg = q.reshape(R, c, hk, g, d)

    if Sp <= block:
        kpos = jnp.arange(Sp)
        mask = kpos[None, None, :] <= q_idx[:, :, None]  # (R, c, Sp)
        scores = jnp.einsum(
            "rchgd,rkhd->rhgck", qg, k_buf, preferred_element_type=jnp.float32
        ) * (d**-0.5)
        scores = jnp.where(mask[:, None, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v_buf.dtype)
        out = jnp.einsum("rhgck,rkhd->rchgd", probs, v_buf)
        return out.reshape(R, c, hq, d)

    if Sp % block:
        raise ValueError(f"block {block} must divide the staging length {Sp}")
    # traced loop bound: blocks past the furthest attended key are skipped
    nblocks = jnp.max(q_idx) // block + 1

    m0 = jnp.full((R, hk, g, c), NEG_INF, jnp.float32)
    l0 = jnp.zeros((R, hk, g, c), jnp.float32)
    acc0 = jnp.zeros((R, hk, g, c, d), jnp.float32)

    def body(j, st):
        m, l, acc = st
        kb = jax.lax.dynamic_slice_in_dim(k_buf, j * block, block, axis=1)
        vb = jax.lax.dynamic_slice_in_dim(v_buf, j * block, block, axis=1)
        s = jnp.einsum(
            "rchgd,rkhd->rhgck", qg, kb, preferred_element_type=jnp.float32
        ) * (d**-0.5)
        kpos = j * block + jnp.arange(block)
        mask = kpos[None, None, :] <= q_idx[:, :, None]
        s = jnp.where(mask[:, None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "rhgck,rkhd->rhgcd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr[..., None] + pv
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = out.transpose(0, 3, 1, 2, 4).reshape(R, c, hq, d)
    return out.astype(v_buf.dtype)


def decode_attention(
    q: jax.Array,  # (B, S, Hq, D)  S = new tokens (usually 1)
    k_cache: jax.Array,  # (B, C, Hk, D) cache already updated with new kv
    v_cache: jax.Array,  # (B, C, Hk, D)
    kv_length: jax.Array,  # () int32 valid cache length (incl. new tokens)
) -> jax.Array:
    """Attention of new tokens against the whole (valid prefix of the) cache.

    New token i (global position kv_length - S + i) attends to cache
    positions <= its own global position.
    """
    b, s, hq, d = q.shape
    c = k_cache.shape[1]
    hk = k_cache.shape[2]
    q_pos = kv_length - s + jnp.arange(s)  # (S,)
    k_pos = jnp.arange(c)  # (C,)
    mask = (k_pos[None, :] <= q_pos[:, None])[None, None]  # (1,1,S,C)

    if hq == hk:
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_cache, preferred_element_type=jnp.float32
        )
        scores = scores * (d**-0.5)
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v_cache.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache)

    # GQA: grouped form — the cache streams at Hk heads, no repeat
    g = hq // hk
    qg = q.reshape(b, s, hk, g, d)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k_cache, preferred_element_type=jnp.float32
    )
    scores = scores * (d**-0.5)
    scores = jnp.where(mask[:, :, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v_cache)
    return out.reshape(b, s, hq, d)
