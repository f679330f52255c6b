"""Autoregressive generation: jitted prefill + lax.while_loop decode.

Replaces the reference's HF ``generate`` path
(llava/model/language_model/llava_llama.py:194-213 + HF sampling loop):
multimodal prefill builds spliced embeddings, populates the KV cache, and a
single compiled while_loop emits tokens until EOS/stop or max_new_tokens.
The whole decode loop is one XLA computation — no per-step host round trip
(the reference crosses python -> CUDA every token, SURVEY.md S3.2).

Batched serving uses a right-padded prompt batch with per-row prompt
lengths; every row decodes in lockstep, finished rows emit padding.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.config import SpatialRGPTConfig
from spatialrgpt_tpu.models import llama, vlm
from spatialrgpt_tpu.ops.flash_attention import _on_tpu


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (B, max_new_tokens) int32, eos-padded
    num_generated: jax.Array  # (B,) int32


class QuantKVCache(NamedTuple):
    """int8 KV cache with per-position-per-head f32 scales (serving only).

    Decode is HBM-bound on the cache read (BASELINE.md); int8 halves that
    stream and the cache's HBM footprint (enabling larger serving batches).
    Scales add 4/(2*D) relative traffic — ~1.6% at D=128.

    Layout is token-major (B, C, Hk, D) — measured fastest for the XLA
    decode path (BASELINE.md: token-major 0.38 ms/layer vs head-major
    0.52 ms/layer at b64; head-major breaks XLA's stream overlap).  At
    batch 64 the decode step sits at the combined weights+KV HBM floor,
    so this path is terminal; the standalone Pallas flash-decode kernel
    (ops/decode_attention.py) is kept as an opt-in experiment.
    """

    k_q: Tuple[jax.Array, ...]  # per layer (B, C, Hk, D) int8
    k_s: Tuple[jax.Array, ...]  # per layer (B, C, Hk) f32
    v_q: Tuple[jax.Array, ...]
    v_s: Tuple[jax.Array, ...]
    length: jax.Array  # () int32


def _sample_token(
    logits: jax.Array,  # (B, V) fp32
    rng: jax.Array,
    temperature: float,
    top_p: float,
) -> jax.Array:
    """Greedy if temperature == 0 else nucleus sampling."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumsum = jnp.cumsum(sorted_probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        k = jnp.sum(cumsum < top_p, axis=-1, keepdims=True)
        threshold = jnp.take_along_axis(sorted_logits, k, axis=-1)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "top_p", "attn_impl",
        "stop_token_ids", "stop_sequences", "kv_quant", "kv_bits",
    ),
)
def generate(
    params: Dict,
    cfg: SpatialRGPTConfig,
    inputs: vlm.VLMInputs,
    prompt_lengths: jax.Array,  # (B,) int32 true prompt length per row
    *,
    max_new_tokens: int = 128,
    temperature: float = 0.0,
    top_p: float = 1.0,
    eos_token_id: Optional[int] = None,
    stop_token_ids: tuple = (),  # extra single-token stop ids
    stop_sequences: tuple = (),  # tuple of tuples: multi-token stop
    # sequences checked inside the compiled loop (the full
    # KeywordsStoppingCriteria equivalent, mm_utils.py:586-617 — the
    # reference decodes the tail and substring-matches keywords; here the
    # generated tail is compared token-wise, static shapes)
    rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    kv_quant: bool = False,  # quantized KV cache (QuantKVCache) for decode
    kv_bits: int = 8,  # 8 or 4 (packed nibbles; coarser — opt-in)
) -> GenerateResult:
    """Multimodal generate.  ``inputs`` is a right-padded prompt batch
    (data/splice.py layout); image/region features are computed once in
    prefill."""
    B, S = inputs.input_ids.shape
    eos = cfg.llm.eos_token_id if eos_token_id is None else eos_token_id
    stops = jnp.asarray((eos,) + tuple(stop_token_ids), jnp.int32)

    def _is_stop(tok):
        return (tok[:, None] == stops[None, :]).any(axis=-1)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # ---- prefill ----
    # flash-attention prefill over the padded prompt (cost S x S) with the
    # per-layer K/V collected, then zero-padded out to cache capacity --
    # cheaper than the decode-attention path (S x capacity scores) and
    # avoids one full cache copy per layer.  Padded rows are masked by
    # segment ids here and by the per-row validity mask during decode.
    embeds = vlm.prepare_embeds(params, cfg, inputs)
    capacity = S + max_new_tokens

    h, kv = llama.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        position_ids=inputs.position_ids,
        segment_ids=inputs.segment_ids,
        attn_impl=attn_impl,
        collect_kv=True,
        kv_quant=kv_quant,
        kv_bits=kv_bits,
    )
    pad_tail = capacity - S

    def _pad(t):
        return jnp.pad(t, ((0, 0), (0, pad_tail)) + ((0, 0),) * (t.ndim - 2))

    if kv_quant:
        # kv entries are (int8, f32 scale) pairs (quantized at collection).
        # HEAD-MAJOR cache layout (B, Hk, C, D) / (B, Hk, C): dense (C, D)
        # int8 tiles — token-major padded (Hk, D) minors to the 32-sublane
        # int8 tile and decoded through strided slice-copies (r5 profile)
        def _pad_h(t):
            t = jnp.swapaxes(t, 1, 2)
            return jnp.pad(
                t, ((0, 0), (0, 0), (0, pad_tail)) + ((0, 0),) * (t.ndim - 3)
            )

        cache = QuantKVCache(
            tuple(_pad_h(a) for a, _ in kv.k),
            tuple(_pad_h(s) for _, s in kv.k),
            tuple(_pad_h(a) for a, _ in kv.v),
            tuple(_pad_h(s) for _, s in kv.v),
            jnp.asarray(S, jnp.int32),
        )
    else:
        cache = llama.KVCache(
            tuple(_pad(k) for k in kv.k),
            tuple(_pad(v) for v in kv.v),
            jnp.asarray(S, jnp.int32),
        )
    last_idx = jnp.maximum(prompt_lengths - 1, 0)  # (B,)
    last_h = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]  # (B, H)
    first_logits = llama.logits(params["llm"], last_h[:, None], cfg.llm)[:, 0]

    rng, step_rng = jax.random.split(rng)
    tok0 = _sample_token(first_logits.astype(jnp.float32), step_rng, temperature, top_p)

    tokens0 = jnp.full((B, max_new_tokens), eos, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    done0 = _is_stop(tok0)
    for seq in stop_sequences:
        if len(seq) == 1:
            done0 = done0 | (tok0 == seq[0])

    # per-row decode positions: row b's t-th new token sits at global
    # position prompt_lengths[b] + t; its KV lives at cache slot S + t
    # (prefill wrote the padded prompt into slots [0, S)).
    def step(state):
        t, tokens, done, cache, rng = state
        prev_tok = tokens[:, t - 1]
        x = llama.embed_tokens(params["llm"], prev_tok[:, None], cfg.llm)
        pos = (prompt_lengths + t - 1)[:, None]
        h, cache = _decode_step(
            params, cfg, x, pos, cache, prompt_lengths, S, t - 1, attn_impl
        )
        logits = llama.logits(params["llm"], h, cfg.llm)[:, 0].astype(jnp.float32)
        rng, step_rng = jax.random.split(rng)
        tok = _sample_token(logits, step_rng, temperature, top_p)
        tok = jnp.where(done, eos, tok)
        tokens = tokens.at[:, t].set(tok)
        done = done | _is_stop(tok)
        # multi-token stop sequences: compare the just-emitted tail
        # (stops AFTER the keyword is generated, like the reference's
        # KeywordsStoppingCriteria; callers strip the matched text)
        for seq in stop_sequences:
            L = len(seq)
            if L > max_new_tokens:
                continue
            if L < 2:
                done = done | (tok == seq[0]) if L == 1 else done
                continue
            start = jnp.maximum(t - (L - 1), 0)
            window = jax.lax.dynamic_slice_in_dim(tokens, start, L, axis=1)
            hit = (window == jnp.asarray(seq, jnp.int32)[None, :]).all(axis=1)
            done = done | (hit & (t >= L - 1))
        return t + 1, tokens, done, cache, rng

    def cond(state):
        t, tokens, done, cache, rng = state
        return (t < max_new_tokens) & ~jnp.all(done)

    t_final, tokens, done, cache, rng = jax.lax.while_loop(
        cond, step, (jnp.asarray(1), tokens0, done0, cache, rng)
    )
    num = jnp.minimum(
        jnp.argmax(tokens == eos, axis=-1) + (tokens == eos).any(axis=-1),
        max_new_tokens,
    )
    num = jnp.where((tokens == eos).any(axis=-1), num, max_new_tokens)
    return GenerateResult(tokens=tokens, num_generated=num)


def _decode_step(params, cfg, x, pos, cache, prompt_lengths, prompt_pad_len, step_idx, attn_impl="xla"):
    """One decode step with a per-row validity mask over the padded prompt.

    Cache layout: [0, prompt_pad_len) = padded prompt, then one slot per
    generated token.  Row b may attend prompt slots < prompt_lengths[b] and
    generated slots <= step_idx.
    """
    B = x.shape[0]
    h = x
    quant = isinstance(cache, QuantKVCache)
    # quant cache is head-major (B, Hk, C, D); bf16 is token-major (B, C, Hk, D)
    capacity = cache.k_q[0].shape[2] if quant else cache.k[0].shape[1]
    slot = prompt_pad_len + step_idx
    slot_ids = jnp.arange(capacity)
    # (B, C) validity: prompt region limited per row; generated region by step
    valid = jnp.where(
        slot_ids[None, :] < prompt_pad_len,
        slot_ids[None, :] < prompt_lengths[:, None],
        slot_ids[None, :] <= slot,
    )
    new_parts = []
    for li, lp in enumerate(params["llm"]["layers"]):
        hn = llama._norm(h, lp["input_ln"], cfg.llm)
        if quant:
            layer_cache = (cache.k_q[li], cache.k_s[li], cache.v_q[li], cache.v_s[li])
            attn_out, parts = _cached_attention_quant(
                hn, lp["attn"], cfg.llm, pos, layer_cache, slot, valid, attn_impl
            )
        else:
            attn_out, parts = _cached_attention(
                hn, lp["attn"], cfg.llm, pos, cache, li, slot, valid
            )
        h = h + attn_out
        hn = llama._norm(h, lp["post_ln"], cfg.llm)
        if cfg.llm.is_moe:
            moe = (
                llama._moe_block_sparse
                if cfg.llm.moe_impl == "sparse"
                else llama._moe_block
            )
            moe_out, _ = moe(hn, lp, cfg.llm)
            h = h + moe_out
        else:
            h = h + llama._mlp_block(hn, lp["mlp"], cfg.llm.hidden_act)
        new_parts.append(parts)
    h = llama._norm(h, params["llm"]["final_ln"], cfg.llm)
    if quant:
        new_cache = QuantKVCache(
            tuple(p[0] for p in new_parts),
            tuple(p[1] for p in new_parts),
            tuple(p[2] for p in new_parts),
            tuple(p[3] for p in new_parts),
            cache.length,
        )
    else:
        new_cache = llama.KVCache(
            tuple(p[0] for p in new_parts), tuple(p[1] for p in new_parts), cache.length
        )
    return h, new_cache


def _rms(x, scale, eps):
    from spatialrgpt_tpu.ops.layers import rms_norm

    return rms_norm(x, scale, eps)


def _cached_attention(x, p, cfg, pos, cache, layer_idx, slot, valid):
    from spatialrgpt_tpu.ops.attention import NEG_INF
    from spatialrgpt_tpu.ops.layers import linear, qkv_proj

    B, S, H = x.shape  # S == 1
    Hq, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q, k, v = qkv_proj(x, p, Hq, Hk, D)
    q, k = llama.apply_rope(q, k, pos, cfg)

    ck = jax.lax.dynamic_update_slice_in_dim(cache.k[layer_idx], k, slot, axis=1)
    cv = jax.lax.dynamic_update_slice_in_dim(cache.v[layer_idx], v, slot, axis=1)

    if Hq == Hk:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, ck, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cv.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, cv).reshape(B, S, Hq * D)
    else:
        # GQA: grouped einsums — the cache read stays at Hk heads (no
        # materialized n_rep repeat; that repeat cost llama3-8b decode
        # ~4x its KV HBM stream)
        G = Hq // Hk
        qg = q.reshape(B, S, Hk, G, D)
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg, ck, preferred_element_type=jnp.float32
        )
        scores = scores * (D**-0.5)
        scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cv.dtype)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, cv).reshape(B, S, Hq * D)
    return linear(out, p["wo"]), (ck, cv)


def _cached_attention_quant(x, p, cfg, pos, layer_cache, slot, valid, attn_impl="xla"):
    """Decode attention against an int8 KV cache (QuantKVCache, one layer,
    HEAD-MAJOR (B, Hk, C, D) — dense (C, D) int8 tiles, r5 layout fix).

    The per-position scales are folded into the score/prob tensors (small,
    (B,H,1,C)) rather than dequantizing the cache into bf16 — the cache is
    only ever read as int8, so the HBM stream stays int8.  This XLA path
    measures at the combined weights+KV HBM floor in the decode loop
    (BASELINE.md); ``attn_impl`` is accepted for interface symmetry but
    the fused Pallas decode kernel (ops/decode_attention.py) is opt-in
    only — it loses XLA's overlap with the weight streams.
    """
    from spatialrgpt_tpu.ops.attention import NEG_INF
    from spatialrgpt_tpu.ops.layers import linear, qkv_proj
    from spatialrgpt_tpu.ops.quant import quantize_kv, quantize_kv4, unpack_kv4

    k_q, k_s, v_q, v_s = layer_cache
    B, S, H = x.shape  # S == 1
    Hq, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q, k, v = qkv_proj(x, p, Hq, Hk, D)
    q, k = llama.apply_rope(q, k, pos, cfg)

    packed4 = k_q.shape[-1] * 2 == D  # int4 nibble-packed cache
    qfn = quantize_kv4 if packed4 else quantize_kv
    unq = unpack_kv4 if packed4 else (lambda t: t)
    nk_q, nk_s = qfn(k)
    nv_q, nv_s = qfn(v)
    # head-major write: new token's (B, 1, Hk[, D]) -> (B, Hk, 1[, D])
    ck_q = jax.lax.dynamic_update_slice_in_dim(k_q, jnp.swapaxes(nk_q, 1, 2), slot, axis=2)
    ck_s = jax.lax.dynamic_update_slice_in_dim(k_s, jnp.swapaxes(nk_s, 1, 2), slot, axis=2)
    cv_q = jax.lax.dynamic_update_slice_in_dim(v_q, jnp.swapaxes(nv_q, 1, 2), slot, axis=2)
    cv_s = jax.lax.dynamic_update_slice_in_dim(v_s, jnp.swapaxes(nv_s, 1, 2), slot, axis=2)

    # NOTE: the fused flat-cache decode kernel (ops/decode_attention.py)
    # is wired into the serving ENGINE, whose long-capacity cache is
    # stored flat token-major; this lockstep path keeps the head-major
    # XLA fold-scale attention (porting it to the flat layout is
    # worthwhile only if long-context lockstep becomes a hot path — the
    # engine is the production entry point for that regime).
    if Hq == Hk:
        scores = jnp.einsum(
            "bqhd,bhkd->bhqk", q, unq(ck_q).astype(q.dtype), preferred_element_type=jnp.float32
        )
        scores = scores * ck_s[:, :, None, :] * (D**-0.5)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        # fold V scales into the (small) probs tensor, keep the cache read int8
        probs = (probs * cv_s[:, :, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bqhd", probs, unq(cv_q).astype(q.dtype)
        ).reshape(B, S, Hq * D)
    else:
        # GQA: grouped einsums — the quantized cache streams at Hk heads
        # (no materialized n_rep repeat, which cost llama3-8b ~4x HBM)
        G = Hq // Hk
        qg = q.reshape(B, S, Hk, G, D)
        scores = jnp.einsum(
            "bqhgd,bhkd->bhgqk", qg, unq(ck_q).astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        scores = scores * ck_s[:, :, None, None, :] * (D**-0.5)
        scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = (probs * cv_s[:, :, None, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bhgqk,bhkd->bqhgd", probs, unq(cv_q).astype(q.dtype)
        ).reshape(B, S, Hq * D)
    return linear(out, p["wo"]), (ck_q, ck_s, cv_q, cv_s)
