"""S² multi-scale vision wrapper.

Rebuild of the reference's VisionTowerS2 (vision_encoder.py:162-196, which
delegates to the external ``s2wrapper.multiscale_forward``): run the tower
at several image scales, split oversized scales into crops of the base
resolution, pool each scale's token grid back to the base grid, and concat
along channels — hidden size becomes base_hidden * len(scales).

TPU-first: all scales are batched into ONE tower forward (crops stacked on
the batch axis) so the ViT runs once at full MXU utilization instead of
len(scales) sequential passes.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _split_crops(x: jax.Array, num_split: int) -> jax.Array:
    """(B, H, W, C) -> (B*n*n, H/n, W/n, C) raster-order crops."""
    b, h, w, c = x.shape
    hs, ws = h // num_split, w // num_split
    x = x.reshape(b, num_split, hs, num_split, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b * num_split * num_split, hs, ws, c)


def _merge_crops(feats: jax.Array, num_split: int) -> jax.Array:
    """(B*n*n, s, s, C) -> (B, n*s, n*s, C)."""
    bnn, s, _, c = feats.shape
    b = bnn // (num_split * num_split)
    x = feats.reshape(b, num_split, num_split, s, s, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, num_split * s, num_split * s, c)


def multiscale_forward(
    tower_fn: Callable[[jax.Array], jax.Array],
    images: jax.Array,  # (B, H, W, C) at the LARGEST scale
    scales: Sequence[int],  # e.g. (336, 672, 1008)
    base_size: int,
) -> jax.Array:
    """Returns (B, (base/patch)^2, hidden * len(scales)).

    Matches s2wrapper semantics: each scale is resized from the input,
    split into base-size crops, encoded, re-assembled, average-pooled to
    the base token grid, and channel-concatenated in scale order.
    """
    b = images.shape[0]
    outs = []
    for scale in scales:
        num_split = scale // base_size
        img = jax.image.resize(
            images, (b, scale, scale, images.shape[-1]), "bilinear", antialias=False
        )
        crops = _split_crops(img, num_split) if num_split > 1 else img
        feats = tower_fn(crops)  # (B*n*n, T, C)
        side = int(round(feats.shape[1] ** 0.5))
        grid = feats.reshape(feats.shape[0], side, side, feats.shape[-1])
        merged = _merge_crops(grid, num_split) if num_split > 1 else grid
        if num_split > 1:
            # average-pool back to the base grid
            ms = merged.shape[1] // side
            merged = merged.reshape(b, side, ms, side, ms, merged.shape[-1]).mean((2, 4))
        outs.append(merged.reshape(b, side * side, -1))
    return jnp.concatenate(outs, axis=-1)
