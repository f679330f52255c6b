"""Region extractor: deconv feature refinement + mask pooling + projectors.

Re-implements the reference's ``RegionExtractor`` (type ``regiongpt``,
llava/model/region_extractor/base_extractor.py:104-177) TPU-first:

- feature_refinement (base_extractor.py:137-147): 27x27 tower grid ->
  deconv2x (2 stacked stride-2 transposed convs, LayerNorm2d+GELU between,
  GELU after, base_extractor.py:87-101) -> 108x108 high-res grid; global
  branch = adaptive-avg-pool back to 27x27.
- Mask pooling (base_extractor.py:27-84): bilinear-resize binary region
  masks from processor resolution to the feature grid, soft-normalize, and
  pool features per region with one einsum.
- Dual linear projectors (rgb / depth) to LLM hidden size.

TPU-native differences: regions are a static-shape ``(B, R, H, W)`` tensor
with a validity mask instead of a ragged list; the stride-2 k=2 transposed
conv is expressed as four matmuls + pixel interleave (pure MXU work, no
scatter); adaptive pooling is two small matrix multiplies.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.config import RegionExtractorConfig
from spatialrgpt_tpu.ops.layers import gelu_erf, layer_norm, linear

Params = Dict


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: RegionExtractorConfig, dtype=jnp.float32) -> Params:
    C = cfg.mm_hidden_size
    H = cfg.hidden_size
    ks = jax.random.split(rng, cfg.deconv_depth + 2)
    deconvs = [
        {
            # (kh, kw, C_in, C_out) with kh = kw = 2
            "kernel": jax.random.normal(ks[i], (2, 2, C, C), dtype) * (C**-0.5),
            "bias": jnp.zeros((C,), dtype),
        }
        for i in range(cfg.deconv_depth)
    ]
    lns = [
        {"scale": jnp.ones((C,), dtype), "bias": jnp.zeros((C,), dtype)}
        for _ in range(cfg.deconv_depth - 1)
    ]
    return {
        "deconvs": deconvs,
        "lns": lns,
        "rgb_projector": {
            "kernel": jax.random.normal(ks[-2], (C, H), dtype) * (C**-0.5),
            "bias": jnp.zeros((H,), dtype),
        },
        "depth_projector": {
            "kernel": jax.random.normal(ks[-1], (C, H), dtype) * (C**-0.5),
            "bias": jnp.zeros((H,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def deconv2x2_s2(x: jax.Array, p: Params) -> jax.Array:
    """Stride-2, kernel-2 transposed conv as matmul + interleave.

    Because kernel == stride there is no output overlap: every input pixel
    (i, j) produces the 2x2 output block (2i..2i+1, 2j..2j+1) as
    ``x[i,j] @ W[:, :, di, dj]``.  Equivalent to torch
    ConvTranspose2d(C, C, kernel_size=2, stride=2) but maps to four MXU
    matmuls instead of a scatter.

    x: (N, H, W, C_in); kernel: (2, 2, C_in, C_out) -> (N, 2H, 2W, C_out).
    """
    n, h, w, ci = x.shape
    k = p["kernel"].astype(x.dtype)  # (2, 2, Ci, Co)
    co = k.shape[-1]
    # (N, H, W, 2, 2, Co)
    y = jnp.einsum("nhwc,pqcd->nhwpqd", x, k, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + p["bias"].astype(x.dtype)
    # interleave: (N, H, 2, W, 2, Co) -> (N, 2H, 2W, Co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    y = y.reshape(n, h * 2, w * 2, co)
    return y


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic (out, in) matrix reproducing AdaptiveAvgPool1d windows:
    window i = [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, s:e] = 1.0 / (e - s)
    return m


def adaptive_avg_pool_2d(x: jax.Array, out_size: int) -> jax.Array:
    """x: (N, H, W, C) -> (N, out, out, C) via two pooling matmuls."""
    n, h, w, c = x.shape
    A = jnp.asarray(_adaptive_pool_matrix(h, out_size), x.dtype)
    B = jnp.asarray(_adaptive_pool_matrix(w, out_size), x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", A, x, preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("pw,nowc->nopc", B, y, preferred_element_type=jnp.float32).astype(x.dtype)
    return y


def feature_refinement(
    params: Params, tower_features: jax.Array, cfg: RegionExtractorConfig
) -> Tuple[jax.Array, jax.Array]:
    """(N, HW, C) tower features -> (hres (N, H'W', C), lres (N, ada^2, C)).

    Mirrors base_extractor.py:137-147: deconv stack with LayerNorm2d+GELU
    between deconvs and a bare GELU after the last one.
    """
    n, hw, c = tower_features.shape
    side = int(round(hw**0.5))
    x = tower_features.reshape(n, side, side, c)
    depth = len(params["deconvs"])
    for d in range(depth):
        x = deconv2x2_s2(x, params["deconvs"][d])
        if d < depth - 1:
            x = layer_norm(x, params["lns"][d], eps=1e-6)
        x = gelu_erf(x)
    hres = x.reshape(n, -1, c)
    lres = adaptive_avg_pool_2d(x, cfg.ada_pool_size).reshape(n, -1, c)
    return hres, lres


def resize_masks_to_grid(masks: jax.Array, grid_side: int) -> jax.Array:
    """Bilinear-resize (B, R, H, W) region masks to (B, R, g, g).

    Matches torch ``F.interpolate(mode='bilinear', align_corners=False)``
    used at base_extractor.py:57 (half-pixel centers, no antialias).
    """
    b, r, h, w = masks.shape
    out = jax.image.resize(
        masks.astype(jnp.float32),
        (b, r, grid_side, grid_side),
        method="bilinear",
        antialias=False,
    )
    return out


def mask_pool(
    features: jax.Array,  # (B, HW, C) flattened feature grid
    masks: jax.Array,  # (B, R, IH, IW) binary-ish masks at processor res
    dtype=None,
) -> jax.Array:
    """Soft mask pooling, one einsum per the reference (base_extractor.py:69-73).

    The mask is resized so its pixel count matches the feature grid
    (scale = sqrt(HW / (IH*IW))), normalized by its sum (+1e-8), then used as
    pooling weights.  Returns (B, R, C).  Invalid (all-zero) regions yield
    ~zero vectors; mask them out downstream with the validity bits.
    """
    b, hw, c = features.shape
    side = int(round(hw**0.5))
    m = resize_masks_to_grid(masks, side)  # (B, R, s, s) fp32
    m = m.astype(features.dtype)
    denorm = jnp.sum(m, axis=(-1, -2), keepdims=True) + 1e-8
    weights = (m / denorm).reshape(b, -1, hw)  # (B, R, HW)
    pooled = jnp.einsum(
        "blc,brl->brc", features, weights, preferred_element_type=jnp.float32
    )
    return pooled.astype(dtype or features.dtype)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def extract_regions(
    params: Params,
    hres_features: jax.Array,  # (B, H'W', C) refined RGB features
    depth_features: Optional[jax.Array],  # (B, HW, C) raw depth tower features
    masks: jax.Array,  # (B, R, IH, IW)
    cfg: RegionExtractorConfig,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Returns (mask_embeds (B, R, hidden), depth_embeds or None).

    NOTE the asymmetry reproduced from the reference (llava_arch.py:401-407):
    RGB pooling uses the deconv-refined high-res grid; depth pooling uses the
    *raw* 27x27 depth tower features.
    """
    rgb_pooled = mask_pool(hres_features, masks)
    mask_embeds = linear(rgb_pooled, params["rgb_projector"])
    depth_embeds = None
    if depth_features is not None:
        depth_pooled = mask_pool(depth_features, masks)
        depth_embeds = linear(depth_pooled, params["depth_projector"])
    return mask_embeds, depth_embeds
