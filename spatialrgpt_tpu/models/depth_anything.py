"""Depth-Anything (DINOv2 + DPT) in JAX.

TPU port of the depth estimator the reference uses for the depth branch at
eval/demo time (llava/eval/eval_spatial.py:29-57 loads Depth-Anything
ViT-L; demo/gradio_web_server_multi.py:119-136): a DINOv2 ViT backbone
(layer-scale, cls token) feeding a DPT decoder (reassemble -> 3x3 convs ->
top-down feature fusion with pre-activation residual units -> depth head).
Weight layout converts 1:1 from HF ``DepthAnythingForDepthEstimation``.

The ``align_corners=True`` bilinear upsampling DPT relies on is expressed
as two interpolation matmuls (MXU work) because jax.image.resize only
implements half-pixel sampling.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.layers import gelu_erf, layer_norm, linear

Params = Dict


@dataclass(frozen=True)
class DepthAnythingConfig:
    hidden_size: int = 1024  # ViT-L
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 518  # nominal square input (pos-embed grid; the
    # forward interpolates positions for other resolutions)
    layer_norm_eps: float = 1e-6
    out_indices: Tuple[int, ...] = (5, 12, 18, 24)  # 1-based layer outputs
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    head_hidden_size: int = 32
    max_depth: float = 1.0  # relative depth
    # metric head (Depth-Anything-V2-Metric style: sigmoid * max_depth
    # instead of the relative relu head) — the Metric3Dv2 slot of the
    # synthesis pipeline predicts canonical-camera depth with this head
    # and de-canonicalizes by focal length (synth/models.py,
    # reference dataset_pipeline/osdsynth/processor/wrappers/
    # metric3d_v2.py:15-68)
    metric: bool = False


# ---------------------------------------------------------------------------
# align_corners=True bilinear resize via interpolation matrices
# ---------------------------------------------------------------------------


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear weights with align_corners=True sampling."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    coords = np.linspace(0, n_in - 1, n_out)
    lo = np.floor(coords).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = coords - lo
    for i in range(n_out):
        m[i, lo[i]] += 1 - frac[i]
        m[i, hi[i]] += frac[i]
    return m


def resize_align_corners(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize with align_corners=True (torch semantics)."""
    n, h, w, c = x.shape
    A = jnp.asarray(_interp_matrix(h, out_hw[0]), x.dtype)
    B = jnp.asarray(_interp_matrix(w, out_hw[1]), x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", A, x, preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("pw,nowc->nopc", B, y, preferred_element_type=jnp.float32).astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# DINOv2 backbone
# ---------------------------------------------------------------------------


def _attention(x, p, num_heads, eps):
    B, S, C = x.shape
    D = C // num_heads
    q = linear(x, p["wq"]).reshape(B, S, num_heads, D)
    k = linear(x, p["wk"]).reshape(B, S, num_heads, D)
    v = linear(x, p["wv"]).reshape(B, S, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32) * (D**-0.5), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return linear(out.reshape(B, S, C), p["wo"])


def _dino_layer(x, p, cfg):
    h = layer_norm(x, p["norm1"], eps=cfg.layer_norm_eps)
    h = _attention(h, p["attn"], cfg.num_attention_heads, cfg.layer_norm_eps)
    x = x + h * p["ls1"].astype(x.dtype)
    h = layer_norm(x, p["norm2"], eps=cfg.layer_norm_eps)
    h = linear(h, p["mlp"]["fc1"])
    h = gelu_erf(h)
    h = linear(h, p["mlp"]["fc2"])
    return x + h * p["ls2"].astype(x.dtype)


def backbone_features(
    params: Params, pixel_values: jax.Array, cfg: DepthAnythingConfig
) -> Tuple[List[jax.Array], int, int]:
    """Returns ([selected hidden states (B, 1+T, C)], ph, pw); each
    selected state passes the backbone's shared final layernorm
    (Dinov2Backbone apply_layernorm=True)."""
    k = params["patch_embed"]["kernel"]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(k.dtype),
        k,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"]
    B, ph, pw, C = x.shape
    x = x.reshape(B, ph * pw, C)
    cls = jnp.broadcast_to(params["cls_token"][None, None, :], (B, 1, C)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interpolate_pos(params["pos_embed"], ph, pw).astype(x.dtype)

    want = set(cfg.out_indices)
    feats = []
    for li, lp in enumerate(params["layers"]):
        x = _dino_layer(x, lp, cfg)
        if (li + 1) in want:
            feats.append(layer_norm(x, params["final_ln"], eps=cfg.layer_norm_eps))
    return feats, ph, pw


def _interpolate_pos(pos_embed: jax.Array, ph: int, pw: int) -> jax.Array:
    """(1 + T0, C) learned positions, bicubically resized to the actual
    grid when resolution differs (DINOv2 interpolate_pos_encoding)."""
    n = pos_embed.shape[0] - 1
    side = int(round(n**0.5))
    if side * side == n and (ph, pw) == (side, side):
        return pos_embed[None]
    cls, grid = pos_embed[:1], pos_embed[1:]
    grid = grid.reshape(1, side, side, -1)
    grid = jax.image.resize(grid, (1, ph, pw, grid.shape[-1]), "bicubic")
    return jnp.concatenate([cls[None], grid.reshape(1, ph * pw, -1)], axis=1)


# ---------------------------------------------------------------------------
# DPT neck + head
# ---------------------------------------------------------------------------


def _conv(x, p, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _deconv(x, p, factor):
    """ConvTranspose(k=factor, s=factor) as matmul + interleave
    (kernel (f, f, Cin, Cout), see region_extractor.deconv2x2_s2)."""
    n, h, w, ci = x.shape
    k = p["kernel"].astype(x.dtype)
    f = k.shape[0]
    co = k.shape[-1]
    y = jnp.einsum("nhwc,pqcd->nhwpqd", x, k, preferred_element_type=jnp.float32).astype(x.dtype)
    y = y + p["bias"].astype(x.dtype)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, h * f, w * f, co)
    return y


def _residual_unit(x, p):
    h = jax.nn.relu(x)
    h = _conv(h, p["conv1"])
    h = jax.nn.relu(h)
    h = _conv(h, p["conv2"])
    return x + h


def _fusion_layer(x, p, residual, out_size):
    if residual is not None:
        if residual.shape[1:3] != x.shape[1:3]:
            residual = jax.image.resize(
                residual, (x.shape[0], x.shape[1], x.shape[2], residual.shape[3]),
                "bilinear", antialias=False,
            )
        x = x + _residual_unit(residual, p["res1"])
    x = _residual_unit(x, p["res2"])
    x = resize_align_corners(x, out_size)
    return _conv(x, p["proj"])


def forward_depth(
    params: Params, pixel_values: jax.Array, cfg: DepthAnythingConfig
) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, H, W) relative depth."""
    feats, ph, pw = backbone_features(params, pixel_values, cfg)

    # reassemble: drop cls, grid-ify, 1x1 project, resize by factor
    maps = []
    for i, f in enumerate(feats):
        B = f.shape[0]
        grid = f[:, 1:].reshape(B, ph, pw, -1)
        grid = _conv(grid, params["reassemble"][i]["proj"])
        factor = cfg.reassemble_factors[i]
        if factor > 1:
            grid = _deconv(grid, params["reassemble"][i]["resize"], int(factor))
        elif factor < 1:
            grid = _conv(grid, params["reassemble"][i]["resize"], stride=int(1 / factor))
        maps.append(grid)

    feats = [_conv(m, params["neck_convs"][i]) for i, m in enumerate(maps)]

    # top-down fusion (deepest first)
    rev = feats[::-1]
    fused = None
    for idx, (f, p) in enumerate(zip(rev, params["fusion"])):
        if idx != len(rev) - 1:
            out_size = rev[idx + 1].shape[1:3]
        else:
            out_size = (f.shape[1] * 2, f.shape[2] * 2)
        fused = _fusion_layer(f if fused is None else fused, p, None if fused is None else f, out_size)

    x = _conv(fused, params["head"]["conv1"])
    x = resize_align_corners(x, (ph * cfg.patch_size, pw * cfg.patch_size))
    x = jax.nn.relu(_conv(x, params["head"]["conv2"]))
    x = _conv(x, params["head"]["conv3"])
    if cfg.metric:
        x = jax.nn.sigmoid(x) * cfg.max_depth
    else:
        x = jax.nn.relu(x) * cfg.max_depth
    return x[..., 0]


def colorize_depth(depth: jax.Array) -> jax.Array:
    """Min-max normalize to uint8 x3 channels (eval_spatial.py:92-106)."""
    d = depth.astype(jnp.float32)
    lo = d.min(axis=(-1, -2), keepdims=True)
    hi = d.max(axis=(-1, -2), keepdims=True)
    u8 = ((d - lo) / jnp.maximum(hi - lo, 1e-8) * 255.0).astype(jnp.uint8)
    return jnp.stack([u8, u8, u8], axis=-1)


# ---------------------------------------------------------------------------
# Eval-time depth predictor (the reference bench protocol)
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _constrain_to_multiple_of(x: float, multiple: int, min_val: int) -> int:
    """Depth-Anything's Resize.constrain_to_multiple_of with lower_bound
    semantics (round to multiple, ceil if under the minimum)."""
    y = int(round(x / multiple) * multiple)
    if y < min_val:
        y = int(np.ceil(x / multiple) * multiple)
    return y


def resize_lower_bound_hw(h: int, w: int, target: int = 518, multiple: int = 14):
    """The reference depth transform's output size: keep-aspect
    'lower_bound' scaling so the SHORT side reaches >= target, each dim
    snapped to a multiple of the patch size (eval_spatial.py:41-52 ->
    depth_anything.util.transform.Resize)."""
    scale_h = target / h
    scale_w = target / w
    scale = max(scale_h, scale_w)
    return (
        _constrain_to_multiple_of(scale * h, multiple, target),
        _constrain_to_multiple_of(scale * w, multiple, target),
    )


class DepthPredictor:
    """Batched TPU equivalent of the reference's eval-time depth path
    (eval_spatial.py:29-57 get_depth_predictor + :92-106 get_depth_map):
    rescale 1/255 -> keep-aspect lower-bound cv2-cubic resize to a
    multiple of 14 -> ImageNet normalize -> DA forward -> bilinear
    (half-pixel) resize back to the original size -> min-max colorize to
    uint8 x3.  Images with the same resized shape batch into one jitted
    forward; results are memoized by a caller-supplied key."""

    def __init__(self, params: Params, cfg: DepthAnythingConfig, target: int = 518):
        self.params = params
        self.cfg = cfg
        self.target = target
        self._cache: Dict[str, np.ndarray] = {}
        self._fwd = jax.jit(lambda p, x: forward_depth(p, x, cfg))

    def _preprocess(self, raw_image: np.ndarray) -> np.ndarray:
        img = np.asarray(raw_image, np.float32) / 255.0
        h, w = img.shape[:2]
        oh, ow = resize_lower_bound_hw(h, w, self.target, self.cfg.patch_size)
        if (oh, ow) != (h, w):
            try:
                import cv2 as _cv2

                img = _cv2.resize(img, (ow, oh), interpolation=_cv2.INTER_CUBIC)
            except ImportError:  # pragma: no cover
                from spatialrgpt_tpu.data.preprocess import pil_bicubic_resize

                img = pil_bicubic_resize(img, oh, ow)
        return (img - _IMAGENET_MEAN) / _IMAGENET_STD

    def predict_colorized(
        self, raw_images: Sequence[np.ndarray], keys: Sequence[str] = ()
    ) -> List[np.ndarray]:
        """(H, W, 3) uint8 RGB arrays -> colorized uint8 x3 depth maps at
        the original sizes.  ``keys`` (e.g. file paths) memoize repeats."""
        keys = list(keys) if keys else [None] * len(raw_images)
        out: List[np.ndarray] = [None] * len(raw_images)
        # group uncached images by resized shape so each shape is one
        # batched device call
        groups: Dict[tuple, list] = {}
        for i, (img, key) in enumerate(zip(raw_images, keys)):
            if key is not None and key in self._cache:
                out[i] = self._cache[key]
                continue
            pre = self._preprocess(np.asarray(img))
            groups.setdefault(pre.shape, []).append((i, key, np.asarray(img), pre))
        for shape, items in groups.items():
            batch = jnp.asarray(np.stack([p for _, _, _, p in items]))
            depth = self._fwd(self.params, batch)  # (B, h', w')
            for (i, key, img, _), d in zip(items, depth):
                oh, ow = img.shape[:2]
                d = jax.image.resize(d, (oh, ow), method="bilinear")
                col = np.asarray(colorize_depth(d))
                out[i] = col
                if key is not None:
                    self._cache[key] = col
        return out


# ---------------------------------------------------------------------------
# Init (training / tests: the metric-head canonical-depth net is fit in
# JAX directly; real released weights go through convert_depth_anything)
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: DepthAnythingConfig, dtype=jnp.float32) -> Params:
    counter = [0]

    def nextkey():
        counter[0] += 1
        return jax.random.fold_in(rng, counter[0])

    H, I = cfg.hidden_size, cfg.intermediate_size

    def dense(din, dout):
        return {
            "kernel": (jax.random.normal(nextkey(), (din, dout)) * din**-0.5).astype(dtype),
            "bias": jnp.zeros((dout,), dtype),
        }

    def ln(dim=H):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    def conv(kh, kw, cin, cout):
        fan = kh * kw * cin
        return {
            "kernel": (jax.random.normal(nextkey(), (kh, kw, cin, cout)) * fan**-0.5).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "norm1": ln(),
                "norm2": ln(),
                "attn": {
                    "wq": dense(H, H), "wk": dense(H, H),
                    "wv": dense(H, H), "wo": dense(H, H),
                },
                "mlp": {"fc1": dense(H, I), "fc2": dense(I, H)},
                "ls1": jnp.full((H,), 1.0, dtype),
                "ls2": jnp.full((H,), 1.0, dtype),
            }
        )

    F = cfg.fusion_hidden_size
    reassemble, neck_convs, fusion = [], [], []
    for i, factor in enumerate(cfg.reassemble_factors):
        nh = cfg.neck_hidden_sizes[i]
        entry = {"proj": conv(1, 1, H, nh)}
        if factor > 1:
            entry["resize"] = conv(int(factor), int(factor), nh, nh)
        elif factor < 1:
            entry["resize"] = conv(3, 3, nh, nh)
        reassemble.append(entry)
        neck_convs.append(conv(3, 3, nh, F))
        fusion.append(
            {
                "proj": conv(1, 1, F, F),
                "res1": {"conv1": conv(3, 3, F, F), "conv2": conv(3, 3, F, F)},
                "res2": {"conv1": conv(3, 3, F, F), "conv2": conv(3, 3, F, F)},
            }
        )

    # pos_embed for the nominal input grid — the forward interpolates
    # positions when the actual resolution differs
    t0 = (cfg.image_size // cfg.patch_size) ** 2
    return {
        "cls_token": (jax.random.normal(nextkey(), (H,)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(nextkey(), (1 + t0, H)) * 0.02).astype(dtype),
        "patch_embed": {
            "kernel": (
                jax.random.normal(nextkey(), (cfg.patch_size, cfg.patch_size, 3, H))
                * (cfg.patch_size * cfg.patch_size * 3) ** -0.5
            ).astype(dtype),
            "bias": jnp.zeros((H,), dtype),
        },
        "layers": layers,
        "final_ln": ln(),
        "reassemble": reassemble,
        "neck_convs": neck_convs,
        "fusion": fusion,
        "head": {
            "conv1": conv(3, 3, F, F // 2),
            "conv2": conv(3, 3, F // 2, cfg.head_hidden_size),
            # zero-init the output conv: the metric head's sigmoid starts
            # mid-range instead of saturated (saturation kills gradients)
            "conv3": {
                "kernel": jnp.zeros((1, 1, cfg.head_hidden_size, 1), dtype),
                "bias": jnp.zeros((1,), dtype),
            },
        },
    }


# ---------------------------------------------------------------------------
# Converter
# ---------------------------------------------------------------------------


def convert_depth_anything(sd, cfg: DepthAnythingConfig, dtype=jnp.float32) -> Params:
    from spatialrgpt_tpu.utils.checkpoint import _dense, _ln, _np

    def conv_w(name, transpose=False):
        w = _np(sd[name + ".weight"])
        # torch conv (Co, Ci, kh, kw) -> HWIO ; deconv (Ci, Co, kh, kw)
        p = {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1) if transpose else w.transpose(2, 3, 1, 0), dtype)}
        if name + ".bias" in sd:
            p["bias"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
        return p

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"backbone.encoder.layer.{i}."
        layers.append(
            {
                "norm1": _ln(sd, lp + "norm1", dtype),
                "norm2": _ln(sd, lp + "norm2", dtype),
                "attn": {
                    "wq": _dense(sd, lp + "attention.attention.query", dtype),
                    "wk": _dense(sd, lp + "attention.attention.key", dtype),
                    "wv": _dense(sd, lp + "attention.attention.value", dtype),
                    "wo": _dense(sd, lp + "attention.output.dense", dtype),
                },
                "mlp": {
                    "fc1": _dense(sd, lp + "mlp.fc1", dtype),
                    "fc2": _dense(sd, lp + "mlp.fc2", dtype),
                },
                "ls1": jnp.asarray(_np(sd[lp + "layer_scale1.lambda1"]), dtype),
                "ls2": jnp.asarray(_np(sd[lp + "layer_scale2.lambda1"]), dtype),
            }
        )

    reassemble = []
    for i, factor in enumerate(cfg.reassemble_factors):
        rp = f"neck.reassemble_stage.layers.{i}."
        entry = {"proj": conv_w(rp + "projection")}
        if factor > 1:
            entry["resize"] = conv_w(rp + "resize", transpose=True)
        elif factor < 1:
            entry["resize"] = conv_w(rp + "resize")
        reassemble.append(entry)

    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        fp = f"neck.fusion_stage.layers.{i}."
        fusion.append(
            {
                "proj": conv_w(fp + "projection"),
                "res1": {
                    "conv1": conv_w(fp + "residual_layer1.convolution1"),
                    "conv2": conv_w(fp + "residual_layer1.convolution2"),
                },
                "res2": {
                    "conv1": conv_w(fp + "residual_layer2.convolution1"),
                    "conv2": conv_w(fp + "residual_layer2.convolution2"),
                },
            }
        )

    return {
        "cls_token": jnp.asarray(_np(sd["backbone.embeddings.cls_token"])[0, 0], dtype),
        "pos_embed": jnp.asarray(_np(sd["backbone.embeddings.position_embeddings"])[0], dtype),
        "patch_embed": {
            "kernel": jnp.asarray(
                _np(sd["backbone.embeddings.patch_embeddings.projection.weight"]).transpose(2, 3, 1, 0),
                dtype,
            ),
            "bias": jnp.asarray(_np(sd["backbone.embeddings.patch_embeddings.projection.bias"]), dtype),
        },
        "layers": layers,
        "final_ln": _ln(sd, "backbone.layernorm", dtype),
        "reassemble": reassemble,
        "neck_convs": [conv_w(f"neck.convs.{i}") for i in range(len(cfg.neck_hidden_sizes))],
        "fusion": fusion,
        "head": {
            "conv1": conv_w("head.conv1"),
            "conv2": conv_w("head.conv2"),
            "conv3": conv_w("head.conv3"),
        },
    }
