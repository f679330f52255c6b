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


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (B, max_new_tokens) int32, eos-padded
    num_generated: jax.Array  # (B,) int32


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
        "cfg", "max_new_tokens", "temperature", "top_p", "attn_impl", "stop_token_ids"
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
    stop_token_ids: tuple = (),  # extra stop ids (KeywordsStoppingCriteria
    # equivalent, mm_utils.py:586-617, for single-token stop strings like
    # <|eot_id|>); multi-token stop strings are stripped by the caller
    rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
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
    compute_dtype = embeds.dtype
    h, kv = llama.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        position_ids=inputs.position_ids,
        segment_ids=inputs.segment_ids,
        attn_impl=attn_impl,
        collect_kv=True,
    )
    pad_tail = capacity - S
    cache = llama.KVCache(
        tuple(jnp.pad(k, ((0, 0), (0, pad_tail), (0, 0), (0, 0))) for k in kv.k),
        tuple(jnp.pad(v, ((0, 0), (0, pad_tail), (0, 0), (0, 0))) for v in kv.v),
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

    # per-row decode positions: row b's t-th new token sits at global
    # position prompt_lengths[b] + t; its KV lives at cache slot S + t
    # (prefill wrote the padded prompt into slots [0, S)).
    def step(state):
        t, tokens, done, cache, rng = state
        prev_tok = tokens[:, t - 1]
        x = llama.embed_tokens(params["llm"], prev_tok[:, None], cfg.llm)
        pos = (prompt_lengths + t - 1)[:, None]
        h, cache = _decode_step(params, cfg, x, pos, cache, prompt_lengths, S, t - 1)
        logits = llama.logits(params["llm"], h, cfg.llm)[:, 0].astype(jnp.float32)
        rng, step_rng = jax.random.split(rng)
        tok = _sample_token(logits, step_rng, temperature, top_p)
        tok = jnp.where(done, eos, tok)
        tokens = tokens.at[:, t].set(tok)
        done = done | _is_stop(tok)
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


def _decode_step(params, cfg, x, pos, cache, prompt_lengths, prompt_pad_len, step_idx):
    """One decode step with a per-row validity mask over the padded prompt.

    Cache layout: [0, prompt_pad_len) = padded prompt, then one slot per
    generated token.  Row b may attend prompt slots < prompt_lengths[b] and
    generated slots <= step_idx.
    """
    B = x.shape[0]
    h = x
    new_ks, new_vs = [], []
    capacity = cache.k[0].shape[1]
    slot = prompt_pad_len + step_idx
    slot_ids = jnp.arange(capacity)
    # (B, C) validity: prompt region limited per row; generated region by step
    valid = jnp.where(
        slot_ids[None, :] < prompt_pad_len,
        slot_ids[None, :] < prompt_lengths[:, None],
        slot_ids[None, :] <= slot,
    )
    for li, lp in enumerate(params["llm"]["layers"]):
        hn = llama._norm(h, lp["input_ln"], cfg.llm)
        attn_out, (ck, cv) = _cached_attention(hn, lp["attn"], cfg.llm, pos, cache, li, slot, valid)
        h = h + attn_out
        hn = llama._norm(h, lp["post_ln"], cfg.llm)
        if cfg.llm.is_moe:
            moe_out, _ = llama._moe_block(hn, lp, cfg.llm)
            h = h + moe_out
        else:
            h = h + llama._mlp_block(hn, lp["mlp"], cfg.llm.hidden_act)
        new_ks.append(ck)
        new_vs.append(cv)
    h = llama._norm(h, params["llm"]["final_ln"], cfg.llm)
    return h, llama.KVCache(tuple(new_ks), tuple(new_vs), cache.length)


def _rms(x, scale, eps):
    from spatialrgpt_tpu.ops.layers import rms_norm

    return rms_norm(x, scale, eps)


def _cached_attention(x, p, cfg, pos, cache, layer_idx, slot, valid):
    from spatialrgpt_tpu.ops.attention import NEG_INF, _repeat_kv
    from spatialrgpt_tpu.ops.layers import linear

    B, S, H = x.shape  # S == 1
    Hq, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = linear(x, p["wq"]).reshape(B, S, Hq, D)
    k = linear(x, p["wk"]).reshape(B, S, Hk, D)
    v = linear(x, p["wv"]).reshape(B, S, Hk, D)
    q, k = llama.apply_rope(q, k, pos, cfg)

    ck = jax.lax.dynamic_update_slice_in_dim(cache.k[layer_idx], k, slot, axis=1)
    cv = jax.lax.dynamic_update_slice_in_dim(cache.v[layer_idx], v, slot, axis=1)

    kk = _repeat_kv(ck, Hq // Hk)
    vv = _repeat_kv(cv, Hq // Hk)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, kk, preferred_element_type=jnp.float32)
    scores = scores * (D**-0.5)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vv.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vv).reshape(B, S, Hq * D)
    return linear(out, p["wo"]), (ck, cv)
