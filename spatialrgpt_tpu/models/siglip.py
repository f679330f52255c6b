"""SigLIP vision tower, TPU-native.

Re-implements the behavior of the reference's SigLIP tower
(llava/model/multimodal_encoder/siglip_encoder.py + vision_encoder.py:14-159,
which wraps HF ``SiglipVisionModel``) as a pure JAX function over an explicit
parameter pytree.  Weight layout is chosen so the HF checkpoint converts by a
simple transpose (see utils/checkpoint.py).

Contract (vision_encoder.py:26-34): run the ViT collecting hidden states,
take ``hidden_states[select_layer]`` (HF convention: index 0 is the embedding
output, index k is the output of layer k), and for ``select_feature='patch'``
drop token 0 ('cls_patch' keeps all).  For the default SpatialRGPT config
(select_layer=-2, cls_patch) this means: embeddings + 26 of 27 encoder
layers, no post-layernorm, all 729 tokens.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.config import SiglipVisionConfig
from spatialrgpt_tpu.ops.layers import gelu_tanh, layer_norm, linear, qkv_proj

Params = Dict

# ViT kernel knobs, read ONCE at import (advisor r4: per-trace env reads
# meant two jits compiled at different times in one process could run
# different kernels for the same call site).  Sweeps (e.g.
# scripts/bench_prepare.py) call set_vit_knobs() and re-jit.
import os as _os

VIT_KNOBS = {
    "xla_attn": _os.environ.get("SRGPT_VIT_XLA_ATTN") == "1",
    "block_h": int(_os.environ.get("SRGPT_VIT_BLOCK_H", 4)),
    "block_q": int(_os.environ.get("SRGPT_VIT_BLOCK_Q") or 0) or None,
    "pad_once": _os.environ.get("SRGPT_VIT_PAD_ONCE", "1") == "1",
}


def set_vit_knobs(**kw) -> None:
    """Override ViT kernel knobs (callers must re-jit: knobs bind at
    trace time)."""
    unknown = set(kw) - set(VIT_KNOBS)
    if unknown:
        raise ValueError(f"unknown vit knobs: {unknown}")
    VIT_KNOBS.update(kw)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: SiglipVisionConfig, dtype=jnp.float32) -> Params:
    """Randomly initialize a SigLIP tower parameter pytree.

    Layout:
      patch_embed: {kernel (P,P,3,C), bias (C,)}
      pos_embed:   (num_patches, C)
      layers: list of per-layer dicts with ln1/ln2 {scale,bias},
              attn {wq,wk,wv,wo each {kernel (Cin,Cout), bias}},
              mlp {fc1,fc2 each {kernel,bias}}
      post_ln: {scale, bias}
    """
    k = jax.random.split(rng, 4 + cfg.num_hidden_layers)
    C = cfg.hidden_size
    P = cfg.patch_size
    I = cfg.intermediate_size

    def dense(key, fan_in, fan_out):
        w = jax.random.normal(key, (fan_in, fan_out), dtype) * (fan_in**-0.5)
        return {"kernel": w, "bias": jnp.zeros((fan_out,), dtype)}

    layers = []
    for li in range(cfg.num_hidden_layers):
        kk = jax.random.split(k[4 + li], 6)
        layers.append(
            {
                "ln1": {"scale": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype)},
                "ln2": {"scale": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype)},
                "attn": {
                    "wq": dense(kk[0], C, C),
                    "wk": dense(kk[1], C, C),
                    "wv": dense(kk[2], C, C),
                    "wo": dense(kk[3], C, C),
                },
                "mlp": {
                    "fc1": dense(kk[4], C, I),
                    "fc2": dense(kk[5], I, C),
                },
            }
        )

    return {
        "patch_embed": {
            "kernel": jax.random.normal(k[0], (P, P, 3, C), dtype) * 0.02,
            "bias": jnp.zeros((C,), dtype),
        },
        "pos_embed": jax.random.normal(k[1], (cfg.num_patches, C), dtype) * 0.02,
        "layers": layers,
        "post_ln": {"scale": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attention(
    x: jax.Array, p: Params, num_heads: int, valid_len: Optional[int] = None
) -> jax.Array:
    """Bidirectional multi-head attention over (B, S, C).

    On TPU the Pallas flash kernel is used (sequence padded to a block
    multiple with segment-id masking); the XLA fallback materializes the
    full (B, H, S, S) score tensor, which at SigLIP's 729 tokens x big
    batches is HBM-bound and dominates TTFT.  ``valid_len`` marks a
    pre-padded sequence (pad-once tower path): keys past it are masked.
    """
    B, S, C = x.shape
    D = C // num_heads
    q, k, v = qkv_proj(x, p, num_heads, num_heads, D)

    from spatialrgpt_tpu.ops.flash_attention import _on_tpu

    if (
        _on_tpu()
        and S >= 256
        and q.dtype == jnp.bfloat16
        and not VIT_KNOBS["xla_attn"]
    ):
        # (bf16-only: the kernel's whole-row VMEM residency is sized for
        # 2-byte elements — f32 inputs exceed the scoped-vmem limit at
        # so400m shapes and belong on the XLA path, e.g. fp32 parity legs)
        # layout-specialized one-pass kernel (ops/vit_attention.py): bf16
        # MXU inputs, no online-softmax state, additive pad bias.  15.6 ms
        # vs 20.7 (generic flash as previously wired) vs 41.0 (XLA
        # materialized) at the so400m serving shape, 128 images
        # (scripts/bench_vit_attn.py).
        from spatialrgpt_tpu.ops.vit_attention import vit_attention

        out = vit_attention(
            q, k, v, block_h=VIT_KNOBS["block_h"],
            block_q=VIT_KNOBS["block_q"], valid_len=valid_len,
        )
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5)
        if valid_len is not None and valid_len < S:
            cols = jnp.arange(S)
            scores = jnp.where(cols[None, None, None, :] < valid_len, scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return linear(out.reshape(B, S, C), p["wo"])


def _encoder_layer(
    x: jax.Array, p: Params, cfg: SiglipVisionConfig,
    valid_len: Optional[int] = None,
) -> jax.Array:
    h = layer_norm(x, p["ln1"], eps=cfg.layer_norm_eps)
    x = x + _attention(h, p["attn"], cfg.num_attention_heads, valid_len)
    h = layer_norm(x, p["ln2"], eps=cfg.layer_norm_eps)
    h = linear(h, p["mlp"]["fc1"])
    h = gelu_tanh(h)
    h = linear(h, p["mlp"]["fc2"])
    return x + h


def embed(params: Params, pixel_values: jax.Array, cfg: SiglipVisionConfig) -> jax.Array:
    """Patchify + positional embedding.  pixel_values: (B, H, W, 3) NHWC."""
    k = params["patch_embed"]["kernel"]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(k.dtype),
        k,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x + params["patch_embed"]["bias"]
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.hidden_size)
    return x + params["pos_embed"][None, :, :].astype(x.dtype)


def forward_features(
    params: Params, pixel_values: jax.Array, cfg: SiglipVisionConfig
) -> jax.Array:
    """Tower features with the reference's feature_select applied.

    pixel_values: (B, H, W, 3), already normalized.
    Returns (B, num_patches, hidden_size).
    """
    x = embed(params, pixel_values, cfg)
    # HF hidden_states has 1 + num_layers entries; select_layer=-2 means we
    # need the output of layer (num_layers - 1), i.e. run all but the last.
    sel = cfg.select_layer
    if sel < 0:
        sel = cfg.num_hidden_layers + 1 + sel
    n_run = sel  # number of encoder layers whose output we need

    # pad-once (TPU serving): pad the 729-token sequence to the lane
    # multiple the attention kernel needs ONCE, instead of 3 pad ops per
    # layer — those pads were ~12% of the tower wall (r4 xplane profile).
    # Padded rows carry garbage through LN/MLP (per-row ops) and are
    # masked out of attention exactly as the kernel's internal padding
    # was, so the valid rows are bit-identical; sliced off at the end.
    from spatialrgpt_tpu.ops.flash_attention import _on_tpu

    S = x.shape[1]
    s_pad = ((S + 127) // 128) * 128
    valid_len = None
    if (
        _on_tpu()
        and s_pad != S
        and S >= 256
        and x.dtype == jnp.bfloat16
        and not VIT_KNOBS["xla_attn"]
        and VIT_KNOBS["pad_once"]
    ):
        x = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))
        valid_len = S
    for li in range(n_run):
        x = _encoder_layer(x, params["layers"][li], cfg, valid_len)
    if valid_len is not None:
        x = x[:, :valid_len]
    if cfg.select_feature == "patch":
        x = x[:, 1:]
    elif cfg.select_feature != "cls_patch":
        raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
    return x


def forward_full(
    params: Params, pixel_values: jax.Array, cfg: SiglipVisionConfig
) -> jax.Array:
    """Full tower (all layers + post layernorm), for checkpoint validation."""
    x = embed(params, pixel_values, cfg)
    for li in range(cfg.num_hidden_layers):
        x = _encoder_layer(x, params["layers"][li], cfg)
    return layer_norm(x, params["post_ln"], eps=cfg.layer_norm_eps)


def resize_pos_embeds(params: Params, cfg: SiglipVisionConfig, new_resolution: int) -> "tuple[Params, SiglipVisionConfig]":
    """Resolution elevation (reference vision_encoder.py:36-113): linearly
    interpolate the learned position table from the checkpoint resolution
    to ``new_resolution`` using the reference's exact index mapping
    (pid = arange(N) / (N-1) * (M-1); new = frac*ceil + (1-frac)*floor).
    Returns updated (params, config)."""
    import dataclasses

    if new_resolution in (cfg.image_size, -1):
        return params, cfg
    num_new = (new_resolution // cfg.patch_size) ** 2
    old = params["pos_embed"]
    old_n = old.shape[0]
    mapped = jnp.arange(num_new, dtype=jnp.float32) / (num_new - 1) * (old_n - 1)
    floor = jnp.clip(jnp.floor(mapped).astype(jnp.int32), 0, old_n - 1)
    ceil = jnp.clip(jnp.ceil(mapped).astype(jnp.int32), 0, old_n - 1)
    frac = (mapped - floor.astype(jnp.float32))[:, None]
    ceil_frac = (ceil.astype(jnp.float32) - mapped)[:, None]
    new_table = frac * old[ceil].astype(jnp.float32) + ceil_frac * old[floor].astype(jnp.float32)
    new_params = dict(params)
    new_params["pos_embed"] = new_table.astype(old.dtype)
    new_cfg = dataclasses.replace(cfg, image_size=new_resolution)
    return new_params, new_cfg
