"""MPT decoder (ALiBi attention), TPU-native.

Rebuild of the reference's vendored MPT stack
(llava/model/language_model/mpt/*: attention.py, modeling_mpt.py, and the
931-line Triton flash kernel): a pre-LN transformer with fused QKV, ALiBi
position biases (no RoPE), bias-free LayerNorms, and GELU FFN.  The
Triton-with-bias flash kernel's role is played by the XLA path here (ALiBi
is a score bias; the Pallas segment-flash kernel can absorb it later).
Converts 1:1 from HF ``MptForCausalLM``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.layers import gelu_erf, linear

Params = Dict
NEG_INF = -1e30


@dataclass(frozen=True)
class MPTConfig:
    d_model: int = 4096
    n_heads: int = 32
    n_layers: int = 32
    vocab_size: int = 50432
    max_seq_len: int = 2048
    expansion_ratio: int = 4
    layer_norm_eps: float = 1e-5
    alibi_bias_max: int = 8

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def alibi_slopes(num_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """MPT's ALiBi slope schedule (build_mpt_alibi_tensor semantics)."""
    next_pow2 = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, next_pow2 + 1, dtype=np.float64)
    base = base * (alibi_bias_max / next_pow2)
    slopes = 1.0 / (2.0**base)
    if next_pow2 != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
    return slopes.astype(np.float32)


def alibi_bias(num_heads: int, seq_len: int, alibi_bias_max: int = 8) -> jax.Array:
    """(1, H, 1, S) bias added to attention scores: slope * (j - (S-1))."""
    slopes = jnp.asarray(alibi_slopes(num_heads, alibi_bias_max))
    pos = jnp.arange(1 - seq_len, 1, dtype=jnp.float32)  # (S,): -(S-1)..0
    return (slopes[:, None] * pos[None, :])[None, :, None, :]


def _ln(x, weight, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def init_params(rng: jax.Array, cfg: MPTConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 1 + cfg.n_layers)
    D = cfg.d_model
    I = cfg.expansion_ratio * D

    def dense(key, fi, fo):
        return {"kernel": jax.random.normal(key, (fi, fo), dtype) * (fi**-0.5)}

    layers = []
    for li in range(cfg.n_layers):
        kk = jax.random.split(ks[1 + li], 4)
        layers.append(
            {
                "norm1": jnp.ones((D,), dtype),
                "wqkv": dense(kk[0], D, 3 * D),
                "out_proj": dense(kk[1], D, D),
                "norm2": jnp.ones((D,), dtype),
                "up": dense(kk[2], D, I),
                "down": dense(kk[3], I, D),
            }
        )
    return {
        "wte": jax.random.normal(ks[0], (cfg.vocab_size, D), dtype) * 0.02,
        "layers": layers,
        "norm_f": jnp.ones((D,), dtype),
    }


def forward_logits(
    params: Params,
    cfg: MPTConfig,
    input_ids: jax.Array,  # (B, S)
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    x = jnp.take(params["wte"], input_ids, axis=0)
    h = forward_embeds(params, cfg, x, segment_ids)
    return jnp.dot(h, params["wte"].T.astype(h.dtype), preferred_element_type=jnp.float32)


def forward_embeds(
    params: Params,
    cfg: MPTConfig,
    inputs_embeds: jax.Array,  # (B, S, D)
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Decoder stack on pre-built embeddings (the composite-VLM entry:
    spliced multimodal embeddings go straight in; ALiBi needs no position
    ids).  Returns final hidden states."""
    x = inputs_embeds
    B, S = x.shape[:2]
    H, D = cfg.n_heads, cfg.head_dim
    bias = alibi_bias(H, S, cfg.alibi_bias_max)

    qi = jnp.arange(S)[:, None]
    ki = jnp.arange(S)[None, :]
    causal = (qi >= ki)[None, None]
    if segment_ids is not None:
        seg = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
            segment_ids[:, :, None] != 0
        )
        causal = causal & seg[:, None]

    for lp in params["layers"]:
        h = _ln(x, lp["norm1"], cfg.layer_norm_eps)
        qkv = linear(h, lp["wqkv"]).reshape(B, S, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s * (D**-0.5) + bias
        s = jnp.where(causal, s, NEG_INF)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, H * D)
        x = x + linear(o, lp["out_proj"])
        h = _ln(x, lp["norm2"], cfg.layer_norm_eps)
        x = x + linear(gelu_erf(linear(h, lp["up"])), lp["down"])

    x = _ln(x, params["norm_f"], cfg.layer_norm_eps)
    return x


def convert_mpt(sd, cfg: MPTConfig, dtype=jnp.float32) -> Params:
    from spatialrgpt_tpu.utils.checkpoint import _np

    layers = []
    for i in range(cfg.n_layers):
        lp = f"transformer.blocks.{i}."
        layers.append(
            {
                "norm1": jnp.asarray(_np(sd[lp + "norm_1.weight"]), dtype),
                "wqkv": {"kernel": jnp.asarray(_np(sd[lp + "attn.Wqkv.weight"]).T, dtype)},
                "out_proj": {"kernel": jnp.asarray(_np(sd[lp + "attn.out_proj.weight"]).T, dtype)},
                "norm2": jnp.asarray(_np(sd[lp + "norm_2.weight"]), dtype),
                "up": {"kernel": jnp.asarray(_np(sd[lp + "ffn.up_proj.weight"]).T, dtype)},
                "down": {"kernel": jnp.asarray(_np(sd[lp + "ffn.down_proj.weight"]).T, dtype)},
            }
        )
    return {
        "wte": jnp.asarray(_np(sd["transformer.wte.weight"]), dtype),
        "layers": layers,
        "norm_f": jnp.asarray(_np(sd["transformer.norm_f.weight"]), dtype),
    }
