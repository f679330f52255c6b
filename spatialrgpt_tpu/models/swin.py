"""Swin Transformer backbone, TPU-native.

The recognize-anything (RAM) tagging model the reference's osdsynth
pipeline loads is a Swin-L@384 image encoder plus a tagging head
(dataset_pipeline/osdsynth/processor/wrappers/ram.py:49-56,
``ram(pretrained=..., image_size=384, vit="swin_l")``).  This module is
the backbone: hierarchical windows (W-MSA / shifted SW-MSA), relative
position bias, and patch merging, weight-compatible with HF ``SwinModel``
state dicts (tests/test_swin_tagger.py checks parity).

TPU-first notes: window partitioning is pure reshape/transpose; the
relative-position index and the shifted-window attention mask are
precomputed per (resolution, window) at trace time (static shapes), so
the whole forward is reshape + matmul + one additive bias — no gathers
in the hot path.  All stage resolutions must be divisible by the
(clamped) window size, which holds for the canonical 224/7 and 384/12
configurations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.layers import gelu_erf, layer_norm, linear

Params = Dict


@dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


SWIN_L_384 = SwinConfig(
    image_size=384,
    patch_size=4,
    embed_dim=192,
    depths=(2, 2, 18, 2),
    num_heads=(6, 12, 24, 48),
    window_size=12,
)


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 relative-position table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, T, T)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


def _shift_attn_mask(hw: int, ws: int, shift: int) -> np.ndarray:
    """(nW, T, T) additive mask (0 / -100) for shifted-window attention."""
    img = np.zeros((hw, hw), np.int32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for hs in slices:
        for wsl in slices:
            img[hs, wsl] = cnt
            cnt += 1
    wins = img.reshape(hw // ws, ws, hw // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B * nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_merge(wins: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    C = wins.shape[-1]
    x = wins.reshape(-1, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, H, W, C)


def _window_attention(x: jax.Array, p: Params, num_heads: int, ws: int, attn_mask) -> jax.Array:
    """x: (BnW, T, C); additive bias from the rel-pos table (+ shift mask)."""
    Bn, T, C = x.shape
    d = C // num_heads
    q = linear(x, p["q"]).reshape(Bn, T, num_heads, d).transpose(0, 2, 1, 3)
    k = linear(x, p["k"]).reshape(Bn, T, num_heads, d).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]).reshape(Bn, T, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (d**-0.5)
    idx = _rel_pos_index(ws)
    bias = p["rel_pos_table"].astype(jnp.float32)[idx.reshape(-1)]  # (T*T, nh)
    bias = bias.reshape(T, T, num_heads).transpose(2, 0, 1)
    scores = scores + bias[None]
    if attn_mask is not None:
        nW = attn_mask.shape[0]
        scores = scores.reshape(-1, nW, num_heads, T, T) + jnp.asarray(attn_mask)[None, :, None]
        scores = scores.reshape(Bn, num_heads, T, T)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(Bn, T, C)
    return linear(out, p["proj"])


def _block(x: jax.Array, p: Params, cfg: SwinConfig, num_heads: int, H: int, shift: int) -> jax.Array:
    """One Swin layer at square resolution H. x: (B, H*H, C)."""
    B, L, C = x.shape
    ws = min(cfg.window_size, H)
    if H <= cfg.window_size:
        shift = 0
    assert H % ws == 0, f"resolution {H} not divisible by window {ws}"
    shortcut = x
    h = layer_norm(x, p["ln1"], cfg.layer_norm_eps).reshape(B, H, H, C)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(h, ws)
    mask = _shift_attn_mask(H, ws, shift) if shift else None
    wins = _window_attention(wins, p["attn"], num_heads, ws, mask)
    h = _window_merge(wins, ws, H, H)
    if shift:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    x = shortcut + h.reshape(B, L, C)
    h = layer_norm(x, p["ln2"], cfg.layer_norm_eps)
    h = linear(gelu_erf(linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    return x + h


def _patch_merge(x: jax.Array, p: Params, H: int, eps: float) -> jax.Array:
    """(B, H*H, C) -> (B, (H/2)^2, 2C): 2x2 neighborhood concat + reduce."""
    B, L, C = x.shape
    g = x.reshape(B, H, H, C)
    cat = jnp.concatenate(
        [g[:, 0::2, 0::2], g[:, 1::2, 0::2], g[:, 0::2, 1::2], g[:, 1::2, 1::2]], axis=-1
    ).reshape(B, (H // 2) * (H // 2), 4 * C)
    return linear(layer_norm(cat, p["norm"], eps), p["reduction"])


def forward(params: Params, pixel_values: jax.Array, cfg: SwinConfig) -> jax.Array:
    """pixel_values: (B, H, W, 3) NHWC -> (B, (H/32)^2, num_features)."""
    k = params["patch_embed"]["kernel"]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(k.dtype),
        k,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x + params["patch_embed"]["bias"]
    B, Hp, Wp, C = x.shape
    x = x.reshape(B, Hp * Wp, C)
    x = layer_norm(x, params["embed_norm"], cfg.layer_norm_eps)

    H = Hp
    for si, stage in enumerate(params["stages"]):
        nh = cfg.num_heads[si]
        for bi, bp in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            x = _block(x, bp, cfg, nh, H, shift)
        if "downsample" in stage:
            x = _patch_merge(x, stage["downsample"], H, cfg.layer_norm_eps)
            H //= 2
    return layer_norm(x, params["final_norm"], cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: SwinConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 4 + 16 * sum(cfg.depths) + 4 * len(cfg.depths)))

    def dense(fi, fo, bias=True):
        p = {"kernel": jax.random.normal(next(keys), (fi, fo), dtype) * (fi**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((fo,), dtype)
        return p

    def ln(n):
        return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    P, D = cfg.patch_size, cfg.embed_dim
    params = {
        "patch_embed": {
            "kernel": jax.random.normal(next(keys), (P, P, 3, D), dtype) * 0.02,
            "bias": jnp.zeros((D,), dtype),
        },
        "embed_norm": ln(D),
        "stages": [],
    }
    for si, depth in enumerate(cfg.depths):
        C = D * 2**si
        I = int(C * cfg.mlp_ratio)
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "ln1": ln(C),
                    "ln2": ln(C),
                    "attn": {
                        "q": dense(C, C),
                        "k": dense(C, C),
                        "v": dense(C, C),
                        "proj": dense(C, C),
                        "rel_pos_table": jax.random.normal(
                            next(keys), ((2 * cfg.window_size - 1) ** 2, cfg.num_heads[si]), dtype
                        )
                        * 0.02,
                    },
                    "mlp": {"fc1": dense(C, I), "fc2": dense(I, C)},
                }
            )
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {"norm": ln(4 * C), "reduction": dense(4 * C, 2 * C, bias=False)}
        params["stages"].append(stage)
    params["final_norm"] = ln(cfg.num_features)
    return params


def _np(t):
    return t.detach().cpu().numpy()


def convert_swin(sd, cfg: SwinConfig, dtype=jnp.float32, prefix: str = "") -> Params:
    """HF ``SwinModel`` state dict -> param pytree (prefix e.g. 'swin.')."""

    def dense(name, bias=True):
        p = {"kernel": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
        if bias and name + ".bias" in sd:
            p["bias"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
        return p

    def ln(name):
        return {
            "scale": jnp.asarray(_np(sd[name + ".weight"]), dtype),
            "bias": jnp.asarray(_np(sd[name + ".bias"]), dtype),
        }

    emb = prefix + "embeddings."
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(
                _np(sd[emb + "patch_embeddings.projection.weight"]).transpose(2, 3, 1, 0), dtype
            ),
            "bias": jnp.asarray(_np(sd[emb + "patch_embeddings.projection.bias"]), dtype),
        },
        "embed_norm": ln(emb + "norm"),
        "stages": [],
    }
    for si, depth in enumerate(cfg.depths):
        st = f"{prefix}encoder.layers.{si}."
        blocks = []
        for bi in range(depth):
            b = st + f"blocks.{bi}."
            blocks.append(
                {
                    "ln1": ln(b + "layernorm_before"),
                    "ln2": ln(b + "layernorm_after"),
                    "attn": {
                        "q": dense(b + "attention.self.query"),
                        "k": dense(b + "attention.self.key"),
                        "v": dense(b + "attention.self.value"),
                        "proj": dense(b + "attention.output.dense"),
                        "rel_pos_table": jnp.asarray(
                            _np(sd[b + "attention.self.relative_position_bias_table"]), dtype
                        ),
                    },
                    "mlp": {
                        "fc1": dense(b + "intermediate.dense"),
                        "fc2": dense(b + "output.dense"),
                    },
                }
            )
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": ln(st + "downsample.norm"),
                "reduction": dense(st + "downsample.reduction", bias=False),
            }
        params["stages"].append(stage)
    params["final_norm"] = ln(prefix + "layernorm")
    return params
