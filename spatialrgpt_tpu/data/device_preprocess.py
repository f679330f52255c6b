"""Device-side (jittable) image front-end — the fused-XLA preprocessing
leg of the BASELINE.json north star ("resize/pad/normalize/patchify ...
becomes fused XLA/Pallas preprocessing").

The host path (data/preprocess.py) is the bit-parity oracle: it
reproduces PIL's bicubic fixed-point math exactly.  This module runs the
SAME math inside jit so serving can ship uint8 pixels across PCIe (half
the bytes of bf16, a quarter of f32) and do resize+normalize on-chip:

  - ``device_resize_uint8``: PIL's uint8 bicubic EXACTLY.  PIL's path is
    integer: per-axis fixed-point matmul (coefficients scaled by 2^22,
    rounded half-away-from-zero), +bias, >>22, clamp to uint8.  The raw
    accumulator reaches ~2^34 — beyond f32's 24-bit exact-integer range —
    so the coefficients are split c = c_hi*2^12 + c_lo with both halves
    small enough that each dot product is an EXACT f32 integer, and the
    shift+clamp is recovered from (p_hi, p_lo) by an exact quotient/
    remainder correction (see _fixed_pass).  The resize becomes two dense
    MXU matmuls (the same matrix trick depth_anything.py uses for
    align-corners resize), bit-identical to Pillow.
  - ``device_siglip_normalize``: the SiglipProcessor rescale+normalize in
    the identical f32 operation order (1-ulp-compatible by construction).
  - ``device_mask_resize_nearest``: cv2 INTER_NEAREST index map (what
    ``process_masks`` uses) as a static gather.

Reference counterpart: SiglipImageProcessor.preprocess behind
llava/mm_utils.py:421-474 (process_image) and :279-375 (process_masks).
Parity is test-gated in tests/test_device_preprocess.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.data.preprocess import _PIL_PRECISION_BITS, _resample_matrix


_SHIFT = 1 << _PIL_PRECISION_BITS  # 2^22
_EXACT = float(1 << 24)  # f32's exact-integer range


@functools.lru_cache(maxsize=64)
def _split_matrices(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """PIL's fixed-point bicubic coefficients split c = hi*2^k + lo, with
    the radix 2^k chosen PER MATRIX so both halves' dots against uint8
    pixels — and every term of the quotient/remainder recovery — are
    provably exact f32 integers.  A fixed k=12 is exact only up to
    downscale ~8x (|lo| <= 2^11 times ~4*scale taps times 255 passes
    2^24 beyond that); large downscales have many small coefficients, so
    a smaller radix keeps |lo| small while |hi| stays bounded.  Verified
    numerically from the actual row sums; raises if no radix works
    (does not occur for any size pair with taps < ~500).
    """
    _, mi = _resample_matrix(in_size, out_size)
    bias = float(1 << (_PIL_PRECISION_BITS - 1))
    for k in (12, 10, 8, 6, 4):
        split = float(1 << k)
        hi = np.round(mi / split)
        lo = mi - hi * split
        hi_bound = float(np.abs(hi).sum(axis=1).max()) * 255.0
        lo_bound = float(np.abs(lo).sum(axis=1).max()) * 255.0 + bias
        # exactness requirements (see _fixed_pass): both dots exact, the
        # remainder r = d*2^k + p_lo' exact (|r| < 2^23 by construction,
        # so |d*2^k| <= 2^23 + lo_bound must stay within 2^24)
        if (
            hi_bound < _EXACT
            and lo_bound < _EXACT / 2
            and hi.max() * 255 * (1 << k) < 2**53  # sanity
        ):
            return np.asarray(hi, np.float32), np.asarray(lo, np.float32), k
    raise ValueError(
        f"no exact f32 split radix for resize {in_size}->{out_size}"
    )


def _fixed_pass(x: jax.Array, hi: jax.Array, lo: jax.Array, k: int, sub: str) -> jax.Array:
    """One PIL fixed-point resample pass on exact-integer f32 tensors.

    True accumulator: s = (p_hi*2^k + p_lo) + 2^21, output
    clip8(s >> 22).  Both dots are exact f32 integers (bounds checked at
    matrix build); the quotient q = floor(s/2^22) is recovered by
    rounding an approximate quotient and correcting with the EXACT
    remainder r = (p_hi - q*2^(22-k))*2^k + p_lo' (|r| < 2^23 since q is
    within 1 of the true quotient, so every term stays within f32's
    exact-integer range).
    """
    split = float(1 << k)
    qstep = float(_SHIFT >> k)  # 2^(22-k)
    p_hi = jnp.einsum(sub, hi, x, preferred_element_type=jnp.float32)
    p_lo = jnp.einsum(sub, lo, x, preferred_element_type=jnp.float32)
    p_lo = p_lo + float(1 << (_PIL_PRECISION_BITS - 1))  # fold the bias in
    approx = (p_hi + p_lo * (1.0 / split)) * (1.0 / qstep)
    q = jnp.round(approx)  # q in [-1, 256]-ish: output-range quotient
    d = p_hi - q * qstep  # exact: integers of magnitude < 2^24
    r = d * split + p_lo  # exact remainder
    under = r < 0
    q = q - under
    r = r + jnp.where(under, float(_SHIFT), 0.0)
    over = r >= float(_SHIFT)
    q = q + over
    out = jnp.where(q < 0, 0.0, jnp.where(q >= 256, 255.0, q))
    return out


def device_resize_uint8(
    images: jax.Array,  # (B, H, W, C) uint8
    out_h: int,
    out_w: int,
) -> jax.Array:
    """PIL-exact bicubic resize of uint8 images on device -> uint8.

    Horizontal pass first, uint8 intermediate, then vertical — the same
    two-pass order as Pillow (and pil_bicubic_resize)."""
    B, H, W, C = images.shape
    x = images.astype(jnp.float32)
    if W != out_w:
        hi, lo, k = _split_matrices(W, out_w)
        x = _fixed_pass(x, jnp.asarray(hi), jnp.asarray(lo), k, "vw,bhwc->bhvc")
    if H != out_h:
        hi, lo, k = _split_matrices(H, out_h)
        x = _fixed_pass(x, jnp.asarray(hi), jnp.asarray(lo), k, "vh,bhwc->bvwc")
    return x.astype(jnp.uint8)


def device_siglip_normalize(
    images_u8: jax.Array,  # (B, S, S, C) uint8 (already at processor size)
    mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
    std: Tuple[float, ...] = (0.5, 0.5, 0.5),
    rescale_factor: float = 1.0 / 255.0,
    dtype=jnp.float32,
) -> jax.Array:
    """SiglipProcessor's rescale+normalize with the identical f32 op
    order (x * rescale, then (x - mean) / std)."""
    c = images_u8.shape[-1]
    x = images_u8.astype(jnp.float32) * np.float32(rescale_factor)
    m = jnp.asarray(np.asarray(mean[:c], np.float32))
    s = jnp.asarray(np.asarray(std[:c], np.float32))
    return ((x - m) / s).astype(dtype)


def device_preprocess_uint8(
    images: jax.Array,  # (B, H, W, C) uint8, any static source size
    out_size: int,
    mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
    std: Tuple[float, ...] = (0.5, 0.5, 0.5),
    dtype=jnp.float32,
) -> jax.Array:
    """resize (PIL-exact) + rescale + normalize: the full SiglipProcessor
    uint8 path on device."""
    resized = device_resize_uint8(images, out_size, out_size)
    return device_siglip_normalize(resized, mean, std, dtype=dtype)


@functools.lru_cache(maxsize=64)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """cv2 INTER_NEAREST source index per output position
    (sx = floor(dx * in/out), clamped) — what process_masks uses."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def device_mask_resize_nearest(
    masks: jax.Array,  # (B, R, H, W) any dtype
    out_size: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Binary region masks -> (B, R, out, out) float, matching
    process_masks' cv2-nearest + un-normalized processor (rescale 1.0)."""
    B, R, H, W = masks.shape
    iy = jnp.asarray(_nearest_index(H, out_size))
    ix = jnp.asarray(_nearest_index(W, out_size))
    out = masks[:, :, iy][:, :, :, ix]
    return out.astype(dtype)
