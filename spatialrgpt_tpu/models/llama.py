"""Llama-family decoder, TPU-native.

Replaces the reference's patched HF decoders
(llava/train/transformers_replace/models/llama/modeling_llama.py and the
Mistral/Gemma variants): a pure-function transformer with

- GQA (num_key_value_heads <= num_attention_heads),
- RoPE with optional linear scaling (reference
  language_model/builder.py:31-38 context extension),
- native packed-segment attention: tokens attend causally *within* their
  segment only, which is the TPU-static equivalent of the reference's
  varlen flash-attention `seqlens_in_batch` path (modeling_llama.py:509-568),
- a static-shape KV cache for autoregressive decode.

Attention is routed through spatialrgpt_tpu.ops.attention so the XLA
reference path and the Pallas flash kernel are interchangeable.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.config import LlamaConfig
from spatialrgpt_tpu.ops import attention as attn_ops
from spatialrgpt_tpu.ops.layers import gelu_tanh, linear, qkv_proj, rms_norm, silu

Params = Dict


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(
    rng: jax.Array,
    cfg: LlamaConfig,
    dtype=jnp.float32,
    extra_vocab: int = 0,
) -> Params:
    ks = jax.random.split(rng, 2 + cfg.num_hidden_layers)
    H = cfg.hidden_size
    Q = cfg.num_attention_heads * cfg.head_dim
    KV = cfg.num_key_value_heads * cfg.head_dim
    I = cfg.intermediate_size
    V = cfg.vocab_size + extra_vocab

    def dense(key, fi, fo):
        return {"kernel": jax.random.normal(key, (fi, fo), dtype) * (fi**-0.5)}

    def mlp_params(keys):
        return {
            "gate": dense(keys[0], H, I),
            "up": dense(keys[1], H, I),
            "down": dense(keys[2], I, H),
        }

    layers = []
    for li in range(cfg.num_hidden_layers):
        kk = jax.random.split(ks[2 + li], 7 + 3 * max(cfg.num_experts, 0))
        layer = {
            "input_ln": jnp.ones((H,), dtype),
            "post_ln": jnp.ones((H,), dtype),
            "attn": {
                "wq": dense(kk[0], H, Q),
                "wk": dense(kk[1], H, KV),
                "wv": dense(kk[2], H, KV),
                "wo": dense(kk[3], Q, H),
            },
        }
        if cfg.is_moe:
            layer["router"] = dense(kk[4], H, cfg.num_experts)
            layer["experts"] = [
                mlp_params(kk[7 + 3 * e : 10 + 3 * e]) for e in range(cfg.num_experts)
            ]
        else:
            layer["mlp"] = mlp_params(kk[4:7])
        layers.append(layer)
    params = {
        "embed_tokens": jax.random.normal(ks[0], (V, H), dtype) * 0.02,
        "layers": layers,
        "final_ln": jnp.ones((H,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(ks[1], H, V)
    return params


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def rope_frequencies(cfg: LlamaConfig) -> jax.Array:
    d = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    return inv_freq


def apply_rope(
    q: jax.Array,  # (B, S, Hq, D)
    k: jax.Array,  # (B, S, Hk, D)
    position_ids: jax.Array,  # (B, S) int32
    cfg: LlamaConfig,
) -> Tuple[jax.Array, jax.Array]:
    """HF-layout rotary embedding (rotate_half convention)."""
    inv_freq = rope_frequencies(cfg)
    pos = position_ids.astype(jnp.float32)
    if cfg.rope_scaling_factor:
        pos = pos / cfg.rope_scaling_factor
    freqs = jnp.einsum("bs,d->bsd", pos, inv_freq)  # (B, S, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, S, D)
    cos = jnp.cos(emb)[:, :, None, :]
    sin = jnp.sin(emb)[:, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        d2 = x.shape[-1] // 2
        rotated = jnp.concatenate([-xf[..., d2:], xf[..., :d2]], axis=-1)
        return (xf * cos + rotated * sin).astype(x.dtype)

    return rot(q), rot(k)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache: lists of (B, C, Hk, D) arrays plus
    the current fill length (scalar int32)."""

    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]
    length: jax.Array  # () int32

    @staticmethod
    def init(cfg: LlamaConfig, batch: int, capacity: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (batch, capacity, cfg.num_key_value_heads, cfg.head_dim)
        zeros = tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_hidden_layers))
        return KVCache(zeros, tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_hidden_layers)), jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _attention_block(
    x: jax.Array,
    p: Params,
    cfg: LlamaConfig,
    position_ids: jax.Array,
    segment_ids: Optional[jax.Array],
    layer_idx: int,
    cache: Optional[KVCache],
    impl: str,
    collect_kv: bool = False,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    B, S, H = x.shape
    Hq, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q, k, v = qkv_proj(x, p, Hq, Hk, D)
    q, k = apply_rope(q, k, position_ids, cfg)

    if cache is not None:
        # decode / incremental prefill: append into the static cache
        ck = jax.lax.dynamic_update_slice_in_dim(cache.k[layer_idx], k, cache.length, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(cache.v[layer_idx], v, cache.length, axis=1)
        kv_len = cache.length + S
        out = attn_ops.decode_attention(q, ck, cv, kv_len)
        new_kv = (ck, cv)
    else:
        out = attn_ops.causal_attention(
            q, k, v, segment_ids=segment_ids, impl=impl, window=cfg.sliding_window
        )
        new_kv = (k, v) if collect_kv else None

    out = out.reshape(B, S, Hq * D)
    return linear(out, p["wo"]), new_kv


def _mlp_block(x: jax.Array, p: Params, act: str = "silu") -> jax.Array:
    a = silu if act == "silu" else gelu_tanh
    if "gu" in p:  # serving-fused gate|up (ops/quant.fuse_serving_kernels)
        h = linear(x, p["gu"])
        gate, up = jnp.split(h, 2, axis=-1)
        return linear(a(gate) * up, p["down"])
    return linear(a(linear(x, p["gate"])) * linear(x, p["up"]), p["down"])


def _moe_block(x: jax.Array, p: Params, cfg: LlamaConfig) -> Tuple[jax.Array, jax.Array]:
    """Mixtral sparse-MoE FFN executed densely (every expert computes on
    every token, combined with top-k router weights), mirroring the
    reference's dense execution (modeling_mixtral_long_context.py) --
    and the MXU-friendly choice at small expert counts.  Returns
    (output, router aux loss)."""
    B, S, H = x.shape
    logits = linear(x, p["router"]).astype(jnp.float32)  # (B,S,E)
    probs = jax.nn.softmax(logits, axis=-1)
    topk = jax.lax.top_k(probs, cfg.num_experts_per_tok)[0][..., -1:]
    gates = jnp.where(probs >= topk, probs, 0.0)
    gates = gates / jnp.maximum(gates.sum(-1, keepdims=True), 1e-9)

    out = jnp.zeros_like(x)
    for e, ep in enumerate(p["experts"]):
        out = out + _mlp_block(x, ep, "silu") * gates[..., e : e + 1].astype(x.dtype)

    # load-balancing loss (switch-style: E * sum_e f_e * P_e)
    frac_tokens = (gates > 0).astype(jnp.float32).mean(axis=(0, 1))
    frac_probs = probs.mean(axis=(0, 1))
    aux = cfg.num_experts * jnp.sum(frac_tokens * frac_probs)
    return out, aux


def stack_experts(llm_params: Params) -> Params:
    """Rewrite per-expert param lists into stacked (E, fi, fo) kernels for
    the grouped-GEMM sparse MoE path (one HBM-resident copy; stacking
    inside jit would materialize ~1 GB/layer per step on mixtral)."""
    out = dict(llm_params)
    layers = []
    for layer in llm_params["layers"]:
        if "experts" not in layer:
            layers.append(layer)
            continue
        nl = {k: v for k, v in layer.items() if k != "experts"}
        nl["experts_stacked"] = {
            name: jnp.stack([e[name]["kernel"] for e in layer["experts"]])
            for name in ("gate", "up", "down")
        }
        layers.append(nl)
    out["layers"] = layers
    return out


def _moe_block_sparse(x: jax.Array, p: Params, cfg: LlamaConfig) -> Tuple[jax.Array, jax.Array]:
    """Top-k sparse MoE via grouped GEMM (``lax.ragged_dot``).

    Each token is duplicated per routing choice, the 2T copies are sorted
    by expert id, and every expert's contiguous slice runs as one ragged
    group — top_k/E of the dense path's FLOPs with no capacity limit and
    no token dropping (beats the reference, which executes all experts on
    all tokens: modeling_mixtral_long_context.py:75-140).  Numerics match
    ``_moe_block`` (same router, same gate normalization, same aux loss).

    Requires stacked expert kernels (``stack_experts``); falls back to the
    dense block when the params still hold a per-expert list.
    """
    if "experts_stacked" not in p:
        return _moe_block(x, p, cfg)
    B, S, H = x.shape
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    T = B * S
    xf = x.reshape(T, H)

    logits = linear(x, p["router"]).astype(jnp.float32).reshape(T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_e = jax.lax.top_k(probs, K)  # (T, K)
    gates = top_p / jnp.maximum(top_p.sum(-1, keepdims=True), 1e-9)

    flat_e = top_e.reshape(-1)  # (T*K,)
    order = jnp.argsort(flat_e)  # stable: preserves token order per expert
    token_idx = order // K
    xs = jnp.take(xf, token_idx, axis=0)  # (T*K, H) sorted by expert
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    st = p["experts_stacked"]
    h_gate = jax.lax.ragged_dot(
        xs, st["gate"].astype(xs.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    h_up = jax.lax.ragged_dot(
        xs, st["up"].astype(xs.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    mid = (jax.nn.silu(h_gate) * h_up).astype(xs.dtype)
    outs = jax.lax.ragged_dot(
        mid, st["down"].astype(xs.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )  # (T*K, H) f32

    w = jnp.take(gates.reshape(-1), order)  # (T*K,) routing weight per row
    outs = outs * w[:, None]
    combined = jnp.zeros((T, H), jnp.float32).at[token_idx].add(outs)
    out = combined.astype(x.dtype).reshape(B, S, H)

    # aux loss identical to the dense block's
    sel = jax.nn.one_hot(top_e, E, dtype=jnp.float32).sum(axis=1)  # (T, E)
    aux = cfg.num_experts * jnp.sum(sel.mean(axis=0) * probs.mean(axis=0))
    return out, aux


def _decoder_layer(x, p, cfg, position_ids, segment_ids, layer_idx, cache, impl, collect_kv=False):
    h = _norm(x, p["input_ln"], cfg)
    attn_out, new_kv = _attention_block(
        h, p["attn"], cfg, position_ids, segment_ids, layer_idx, cache, impl, collect_kv
    )
    x = x + attn_out
    h = _norm(x, p["post_ln"], cfg)
    aux = jnp.zeros((), jnp.float32)
    if cfg.is_moe:
        block = _moe_block_sparse if cfg.moe_impl == "sparse" else _moe_block
        moe_out, aux = block(h, p, cfg)
        x = x + moe_out
    else:
        x = x + _mlp_block(h, p["mlp"], cfg.hidden_act)
    return x, new_kv, aux


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def embed_tokens(params: Params, input_ids: jax.Array, cfg: "LlamaConfig" = None) -> jax.Array:
    x = jnp.take(params["embed_tokens"], input_ids, axis=0)
    if cfg is not None and cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)
    return x


def _norm(x, scale, cfg: LlamaConfig):
    if cfg.norm_plus_one:
        return rms_norm(x, 1.0 + scale.astype(jnp.float32), cfg.rms_norm_eps)
    return rms_norm(x, scale, cfg.rms_norm_eps)


def forward(
    params: Params,
    cfg: LlamaConfig,
    *,
    inputs_embeds: jax.Array,  # (B, S, H)
    position_ids: jax.Array,  # (B, S)
    segment_ids: Optional[jax.Array] = None,  # (B, S); 0 = padding
    cache: Optional[KVCache] = None,
    attn_impl: str = "xla",
    collect_kv: bool = False,
    kv_quant: bool = False,  # quantize collected K/V at collection time
    # (per layer, so the bf16 tensors die immediately — keeps prefill
    # peak memory at quantized scale for quantized-cache serving)
    kv_bits: int = 8,  # 8 (int8) or 4 (packed nibbles) when kv_quant
    remat: bool = False,
    with_aux: bool = False,  # also return the summed MoE router aux loss
):
    """Run the decoder stack. Returns (hidden_states, updated cache).

    With ``segment_ids``, attention is causal within equal-id runs and
    blocked across them (packed-batch semantics); id 0 marks padding.
    With ``collect_kv`` (cache is None) the per-layer K/V of this pass are
    returned as a KVCache with capacity == S — the flash-attention prefill
    path (attention cost S x S instead of S x capacity, no cache-copy).
    """
    x = inputs_embeds
    new_ks, new_vs = [], []
    aux_total = jnp.zeros((), jnp.float32)
    layer_fn = _decoder_layer
    if remat and cache is None:
        # gradient checkpointing (reference --gradient_checkpointing):
        # recompute each decoder layer's activations in the backward pass
        layer_fn = jax.checkpoint(
            _decoder_layer, static_argnums=(2, 6, 7, 8), policy=None
        )
    for li, lp in enumerate(params["layers"]):
        x, new_kv, aux = layer_fn(
            x, lp, cfg, position_ids, segment_ids, li, cache, attn_impl, collect_kv
        )
        aux_total = aux_total + aux
        if new_kv is not None:
            if kv_quant and cache is None:
                from spatialrgpt_tpu.ops.quant import quantize_kv, quantize_kv4

                qfn = quantize_kv4 if kv_bits == 4 else quantize_kv
                new_ks.append(qfn(new_kv[0]))  # (payload, f32 scale)
                new_vs.append(qfn(new_kv[1]))
            else:
                new_ks.append(new_kv[0])
                new_vs.append(new_kv[1])
    x = _norm(x, params["final_ln"], cfg)
    new_cache = None
    if cache is not None:
        new_cache = KVCache(tuple(new_ks), tuple(new_vs), cache.length + inputs_embeds.shape[1])
    elif collect_kv:
        new_cache = KVCache(tuple(new_ks), tuple(new_vs), jnp.asarray(inputs_embeds.shape[1], jnp.int32))
    if with_aux:
        return x, new_cache, aux_total
    return x, new_cache


def logits(params: Params, hidden: jax.Array, cfg: LlamaConfig) -> jax.Array:
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"].astype(hidden.dtype)
        return jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
    return linear(hidden, params["lm_head"]).astype(jnp.float32)


def forward_logits(params, cfg, *, input_ids, position_ids, segment_ids=None, attn_impl="xla"):
    """Convenience: ids -> logits (no cache)."""
    x = embed_tokens(params, input_ids, cfg)
    h, _ = forward(
        params,
        cfg,
        inputs_embeds=x,
        position_ids=position_ids,
        segment_ids=segment_ids,
        attn_impl=attn_impl,
    )
    return logits(params, h, cfg)
