"""CLIP vision tower (alternative to SigLIP).

Rebuild of the reference's CLIPVisionTower (llava/model/multimodal_encoder/
clip_encoder.py wrapping HF ``CLIPVisionModel``): class-token ViT with
pre-layernorm, quick-GELU MLPs, and the same feature_select contract
(hidden_states[select_layer]; 'patch' drops the CLS token — the default
for CLIP, vision_encoder.py:26-34).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.config import SiglipVisionConfig as CLIPVisionConfig
from spatialrgpt_tpu.ops.layers import layer_norm, linear, qkv_proj

Params = Dict


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def init_params(rng: jax.Array, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Params:
    k = jax.random.split(rng, 5 + cfg.num_hidden_layers)
    C = cfg.hidden_size
    P = cfg.patch_size
    I = cfg.intermediate_size

    def dense(key, fi, fo):
        return {
            "kernel": jax.random.normal(key, (fi, fo), dtype) * (fi**-0.5),
            "bias": jnp.zeros((fo,), dtype),
        }

    layers = []
    for li in range(cfg.num_hidden_layers):
        kk = jax.random.split(k[5 + li], 6)
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
                "mlp": {"fc1": dense(kk[4], C, I), "fc2": dense(kk[5], I, C)},
            }
        )
    return {
        "class_embed": jax.random.normal(k[0], (C,), dtype) * 0.02,
        "patch_embed": {
            "kernel": jax.random.normal(k[1], (P, P, 3, C), dtype) * 0.02
        },  # CLIP conv has no bias
        "pos_embed": jax.random.normal(k[2], (cfg.num_patches + 1, C), dtype) * 0.02,
        "pre_ln": {"scale": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype)},
        "layers": layers,
        "post_ln": {"scale": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype)},
    }


def _attention(x, p, num_heads):
    B, S, C = x.shape
    D = C // num_heads
    q, k, v = qkv_proj(x, p, num_heads, num_heads, D)
    from spatialrgpt_tpu.ops.flash_attention import _on_tpu

    if _on_tpu() and S >= 256:
        from spatialrgpt_tpu.ops.vit_attention import vit_attention

        out = vit_attention(q, k, v, block_h=4)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores.astype(jnp.float32) * (D**-0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return linear(out.reshape(B, S, C), p["wo"])


def _layer(x, p, cfg):
    h = layer_norm(x, p["ln1"], eps=cfg.layer_norm_eps)
    x = x + _attention(h, p["attn"], cfg.num_attention_heads)
    h = layer_norm(x, p["ln2"], eps=cfg.layer_norm_eps)
    h = quick_gelu(linear(h, p["mlp"]["fc1"]))
    return x + linear(h, p["mlp"]["fc2"])


def embed(params: Params, pixel_values: jax.Array, cfg: CLIPVisionConfig) -> jax.Array:
    k = params["patch_embed"]["kernel"]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(k.dtype),
        k,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embed"][None, None, :], (B, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["pos_embed"][None].astype(x.dtype)


def forward_features(params: Params, pixel_values: jax.Array, cfg: CLIPVisionConfig) -> jax.Array:
    x = embed(params, pixel_values, cfg)
    x = layer_norm(x, params["pre_ln"], eps=cfg.layer_norm_eps)
    sel = cfg.select_layer
    if sel < 0:
        sel = cfg.num_hidden_layers + 1 + sel
    for li in range(sel):
        x = _layer(x, params["layers"][li], cfg)
    if cfg.select_feature == "patch":
        x = x[:, 1:]
    elif cfg.select_feature != "cls_patch":
        raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
    return x


def convert_clip(sd, num_layers, dtype=jnp.float32) -> Params:
    """HF CLIPVisionModel state dict -> this pytree."""
    import numpy as np

    from spatialrgpt_tpu.utils.checkpoint import _dense, _ln, _np

    pref = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    layers = []
    for i in range(num_layers):
        lp = f"{pref}encoder.layers.{i}."
        layers.append(
            {
                "ln1": _ln(sd, lp + "layer_norm1", dtype),
                "ln2": _ln(sd, lp + "layer_norm2", dtype),
                "attn": {
                    "wq": _dense(sd, lp + "self_attn.q_proj", dtype),
                    "wk": _dense(sd, lp + "self_attn.k_proj", dtype),
                    "wv": _dense(sd, lp + "self_attn.v_proj", dtype),
                    "wo": _dense(sd, lp + "self_attn.out_proj", dtype),
                },
                "mlp": {
                    "fc1": _dense(sd, lp + "mlp.fc1", dtype),
                    "fc2": _dense(sd, lp + "mlp.fc2", dtype),
                },
            }
        )
    emb = pref + "embeddings."
    return {
        "class_embed": jnp.asarray(_np(sd[emb + "class_embedding"]), dtype),
        "patch_embed": {
            "kernel": jnp.asarray(
                _np(sd[emb + "patch_embedding.weight"]).transpose(2, 3, 1, 0), dtype
            )
        },
        "pos_embed": jnp.asarray(_np(sd[emb + "position_embedding.weight"]), dtype),
        "pre_ln": _ln(sd, pref + "pre_layrnorm", dtype),
        "layers": layers,
        "post_ln": _ln(sd, pref + "post_layernorm", dtype),
    }
