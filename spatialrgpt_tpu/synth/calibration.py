"""Camera calibration models for the synthesis pipeline.

The reference lifts 2D detections to metric 3D with three learned
estimators (dataset_pipeline/osdsynth/processor/pointcloud.py:20-100):

  - PerspectiveFields / GeoCalib  -> roll, pitch   (gravity direction)
  - WildCamera                    -> intrinsics K  (focal / principal pt)
  - Metric3Dv2                    -> metric depth  (canonical camera)

This module provides the TPU-native counterpart for the first two: one
compact ViT regressor (``CameraNet``) predicting (roll_deg, pitch_deg,
vfov_deg) from an RGB image, trained/convertible like any other model in
the package, plus the pipeline adapters ``make_gravity_model`` and
``make_intrinsics_model``.  The metric-depth slot is the Depth-Anything
port with ``metric=True`` plus the canonical-camera de-canonicalization
in ``synth/models.py::make_metric_depth_model`` (the Metric3Dv2 wrapper
contract, wrappers/metric3d_v2.py:15-68).

One network with three heads replaces two reference networks: roll/pitch
and field-of-view are jointly observable from the same perspective cues
(horizon position, vanishing-point convergence), and a single batched ViT
forward is the TPU-friendly shape (the reference runs two separate torch
hub models per image).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.layers import layer_norm, linear

Params = Dict


@dataclass(frozen=True)
class CameraNetConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 256
    num_hidden_layers: int = 6
    num_attention_heads: int = 4
    intermediate_size: int = 1024
    layer_norm_eps: float = 1e-6
    # output ranges: angles are regressed directly in degrees; vfov is
    # squashed to (vfov_min, vfov_max) via sigmoid
    vfov_min_deg: float = 20.0
    vfov_max_deg: float = 120.0


def init_params(rng: jax.Array, cfg: CameraNetConfig, dtype=jnp.float32) -> Params:
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    H, I = cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(rng, 4 + 8 * cfg.num_hidden_layers))

    def dense(k, din, dout):
        return {
            "kernel": (jax.random.normal(k, (din, dout)) * din**-0.5).astype(dtype),
            "bias": jnp.zeros((dout,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "ln1": ln(),
                "ln2": ln(),
                "attn": {
                    "wq": dense(next(keys), H, H),
                    "wk": dense(next(keys), H, H),
                    "wv": dense(next(keys), H, H),
                    "wo": dense(next(keys), H, H),
                },
                "mlp": {
                    "fc1": dense(next(keys), H, I),
                    "fc2": dense(next(keys), I, H),
                },
            }
        )
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": dense(next(keys), patch_dim, H),
        "pos_embed": (jax.random.normal(next(keys), (n_patches, H)) * 0.02).astype(dtype),
        "layers": layers,
        "final_ln": ln(),
        "head": dense(next(keys), H, 3),  # (roll, pitch, vfov_logit)
    }


def _attention(x: jax.Array, p, num_heads: int) -> jax.Array:
    B, S, H = x.shape
    D = H // num_heads
    q = linear(x, p["wq"]).reshape(B, S, num_heads, D)
    k = linear(x, p["wk"]).reshape(B, S, num_heads, D)
    v = linear(x, p["wv"]).reshape(B, S, num_heads, D)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * D**-0.5, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, H)
    return linear(out, p["wo"])


def forward(params: Params, pixel_values: jax.Array, cfg: CameraNetConfig) -> jax.Array:
    """(B, S, S, 3) normalized pixels -> (B, 3) = (roll_deg, pitch_deg, vfov_deg)."""
    B = pixel_values.shape[0]
    P = cfg.patch_size
    n = cfg.image_size // P
    # patchify: (B, n, P, n, P, 3) -> (B, n*n, P*P*3)
    x = pixel_values.reshape(B, n, P, n, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, n * n, P * P * 3)
    x = linear(x, params["patch_embed"]) + params["pos_embed"][None]
    for lp in params["layers"]:
        x = x + _attention(layer_norm(x, lp["ln1"], cfg.layer_norm_eps), lp["attn"], cfg.num_attention_heads)
        h = linear(layer_norm(x, lp["ln2"], cfg.layer_norm_eps), lp["mlp"]["fc1"])
        x = x + linear(jax.nn.gelu(h, approximate=True), lp["mlp"]["fc2"])
    x = layer_norm(x.mean(axis=1, keepdims=True), params["final_ln"], cfg.layer_norm_eps)[:, 0]
    out = linear(x, params["head"]).astype(jnp.float32)
    roll, pitch, fov_logit = out[:, 0], out[:, 1], out[:, 2]
    vfov = cfg.vfov_min_deg + (cfg.vfov_max_deg - cfg.vfov_min_deg) * jax.nn.sigmoid(fov_logit)
    return jnp.stack([roll, pitch, vfov], axis=-1)


def calib_loss(params: Params, cfg: CameraNetConfig, pixel_values: jax.Array, targets: jax.Array) -> jax.Array:
    """Smooth-L1 on (roll, pitch, vfov) degrees — the training objective for
    fitting the regressor (PerspectiveFields trains per-pixel field losses;
    a direct angle regression is the compact equivalent for our head)."""
    pred = forward(params, pixel_values, cfg)
    err = pred - targets.astype(jnp.float32)
    ae = jnp.abs(err)
    return jnp.mean(jnp.where(ae < 1.0, 0.5 * err * err, ae - 0.5))


# ---------------------------------------------------------------------------
# Pipeline adapters (LiftStage slots)
# ---------------------------------------------------------------------------


def _prep(image: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * (255.0 if img.max() <= 1.5 else 1.0), 0, 255).astype(np.uint8)
    x = np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR), np.float32)
    return (x / 255.0 - 0.5) / 0.5


def intrinsics_from_vfov(width: int, height: int, vfov_deg: float) -> np.ndarray:
    """Pinhole K from a vertical field of view (square pixels)."""
    f = 0.5 * height / math.tan(math.radians(vfov_deg) / 2)
    return np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])


def make_gravity_model(params: Params, cfg: CameraNetConfig) -> Callable:
    """image -> (roll_deg, pitch_deg): the PerspectiveFields/GeoCalib slot
    (reference pointcloud.py:57-76)."""
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))

    def gravity_model(image: np.ndarray) -> Tuple[float, float]:
        out = np.asarray(fwd(params, jnp.asarray(_prep(image, cfg.image_size))[None]))[0]
        return float(out[0]), float(out[1])

    return gravity_model


def make_intrinsics_model(params: Params, cfg: CameraNetConfig) -> Callable:
    """image -> (3, 3) K: the WildCamera slot (reference pointcloud.py:85)."""
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))

    def intrinsics_model(image: np.ndarray) -> np.ndarray:
        H, W = np.asarray(image).shape[:2]
        out = np.asarray(fwd(params, jnp.asarray(_prep(image, cfg.image_size))[None]))[0]
        return intrinsics_from_vfov(W, H, float(out[2]))

    return intrinsics_model
