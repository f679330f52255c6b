"""InternViT vision tower (InternViT-6B family).

Rebuild of the reference's vendored InternViT
(llava/model/multimodal_encoder/intern/modeling_intern_vit.py, 543 LoC +
the flash-attn qkv-packed wrapper): a class-token ViT with

  - RMSNorm (not LayerNorm) pre-norms,
  - optional QK normalization applied across the FLATTENED head dim
    (modeling_intern_vit.py:336-339 — the norm sees (B, N, H*D)),
  - LayerScale (ls1/ls2) residual scaling,
  - gelu MLP,

and feature_select like the other towers.  Weight layout converts from
HF ``InternVLVisionModel`` (the released InternViT checkpoint layout)
via ``convert_intern_vit`` — parity in
tests/test_towers_extra.py::test_intern_vit_hf_parity; the hand-built
replica tests additionally pin the vendored reference's block math.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.ops.layers import gelu_erf, linear

Params = Dict


@dataclass(frozen=True)
class InternVisionConfig:
    hidden_size: int = 3200  # InternViT-6B
    intermediate_size: int = 12800
    num_hidden_layers: int = 48
    num_attention_heads: int = 25
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    qk_normalization: bool = True
    select_layer: int = -1
    select_feature: str = "patch"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def init_params(rng: jax.Array, cfg: InternVisionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 3 + cfg.num_hidden_layers)
    C, I = cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size

    def dense(key, fi, fo, bias=True):
        p = {"kernel": jax.random.normal(key, (fi, fo), dtype) * (fi**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((fo,), dtype)
        return p

    layers = []
    for li in range(cfg.num_hidden_layers):
        kk = jax.random.split(ks[3 + li], 4)
        layer = {
            "norm1": jnp.ones((C,), dtype),
            "norm2": jnp.ones((C,), dtype),
            "qkv": dense(kk[0], C, 3 * C),
            "proj": dense(kk[1], C, C),
            "mlp": {"fc1": dense(kk[2], C, I), "fc2": dense(kk[3], I, C)},
            "ls1": jnp.ones((C,), dtype),
            "ls2": jnp.ones((C,), dtype),
        }
        if cfg.qk_normalization:
            layer["q_norm"] = jnp.ones((C,), dtype)
            layer["k_norm"] = jnp.ones((C,), dtype)
        layers.append(layer)
    return {
        "class_embed": jax.random.normal(ks[0], (C,), dtype) * 0.02,
        "patch_embed": {
            "kernel": jax.random.normal(ks[1], (P, P, 3, C), dtype) * 0.02,
            "bias": jnp.zeros((C,), dtype),
        },
        "pos_embed": jax.random.normal(ks[2], (cfg.num_patches + 1, C), dtype) * 0.02,
        "layers": layers,
    }


def _attention(x: jax.Array, p: Params, cfg: InternVisionConfig) -> jax.Array:
    B, N, C = x.shape
    H = cfg.num_attention_heads
    D = C // H
    qkv = linear(x, p["qkv"]).reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if "q_norm" in p:
        # qk-norm over the flattened (H*D) axis, then reshape back
        q = _rms(q.reshape(B, N, C), p["q_norm"], cfg.layer_norm_eps).reshape(B, N, H, D)
        k = _rms(k.reshape(B, N, C), p["k_norm"], cfg.layer_norm_eps).reshape(B, N, H, D)
    from spatialrgpt_tpu.ops.flash_attention import _on_tpu

    if _on_tpu() and N >= 256:
        from spatialrgpt_tpu.ops.vit_attention import vit_attention

        o = vit_attention(q, k, v, block_h=4).reshape(B, N, C)
    else:
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * (D**-0.5)
        pr = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", pr, v).reshape(B, N, C)
    return linear(o, p["proj"])


def forward_features(params: Params, pixel_values: jax.Array, cfg: InternVisionConfig) -> jax.Array:
    k = params["patch_embed"]["kernel"]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(k.dtype),
        k,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"]
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embed"][None, None, :], (B, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None].astype(x.dtype)

    sel = cfg.select_layer
    if sel < 0:
        sel = cfg.num_hidden_layers + 1 + sel
    for li in range(sel):
        p = params["layers"][li]
        x = x + _attention(_rms(x, p["norm1"], cfg.layer_norm_eps), p, cfg) * p["ls1"].astype(x.dtype)
        h = _rms(x, p["norm2"], cfg.layer_norm_eps)
        h = linear(gelu_erf(linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])
        x = x + h * p["ls2"].astype(x.dtype)
    if cfg.select_feature == "patch":
        x = x[:, 1:]
    return x


def _np(t):
    return t.detach().cpu().numpy()


def convert_intern_vit(sd, cfg: InternVisionConfig, dtype=jnp.float32) -> Params:
    """HF ``InternVLVisionModel`` state dict -> param pytree.

    The released InternViT checkpoints (OpenGVLab/InternViT-*) ship in
    this layout on the hub; HF's separate q/k/v projections concatenate
    into our fused qkv (column blocks [q|k|v], matching the vendored
    reference's packed qkv at modeling_intern_vit.py).  Biasless
    projections (attention_bias=False) simply omit the bias entry.
    """
    import numpy as np

    def dense(name, bias=True):
        p = {"kernel": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
        if bias and name + ".bias" in sd:
            p["bias"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
        return p

    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}."
        qkv_w = np.concatenate(
            [_np(sd[b + f"attention.{n}_proj.weight"]).T for n in ("q", "k", "v")], axis=1
        )
        qkv = {"kernel": jnp.asarray(qkv_w, dtype)}
        if b + "attention.q_proj.bias" in sd:
            qkv["bias"] = jnp.asarray(
                np.concatenate(
                    [_np(sd[b + f"attention.{n}_proj.bias"]) for n in ("q", "k", "v")]
                ),
                dtype,
            )
        layer = {
            "norm1": jnp.asarray(_np(sd[b + "layernorm_before.weight"]), dtype),
            "norm2": jnp.asarray(_np(sd[b + "layernorm_after.weight"]), dtype),
            "qkv": qkv,
            "proj": dense(b + "attention.projection_layer"),
            "mlp": {"fc1": dense(b + "mlp.fc1"), "fc2": dense(b + "mlp.fc2")},
            "ls1": jnp.asarray(_np(sd[b + "lambda_1"]), dtype),
            "ls2": jnp.asarray(_np(sd[b + "lambda_2"]), dtype),
        }
        if cfg.qk_normalization:
            layer["q_norm"] = jnp.asarray(_np(sd[b + "attention.q_norm.weight"]), dtype)
            layer["k_norm"] = jnp.asarray(_np(sd[b + "attention.k_norm.weight"]), dtype)
        layers.append(layer)
    return {
        "class_embed": jnp.asarray(_np(sd["embeddings.cls_token"])[0, 0], dtype),
        "patch_embed": {
            "kernel": jnp.asarray(
                _np(sd["embeddings.patch_embeddings.projection.weight"]).transpose(2, 3, 1, 0),
                dtype,
            ),
            "bias": jnp.asarray(_np(sd["embeddings.patch_embeddings.projection.bias"]), dtype),
        },
        "pos_embed": jnp.asarray(_np(sd["embeddings.position_embeddings"])[0], dtype),
        "layers": layers,
    }
