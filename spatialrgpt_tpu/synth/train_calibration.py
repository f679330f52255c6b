"""Training recipes for the synthesis pipeline's learned estimators.

The reference's 2D->3D lift uses three *pretrained* torch-hub models
(dataset_pipeline/osdsynth/processor/pointcloud.py:20-100): Perspective
Fields (roll/pitch), WildCamera (intrinsics) and Metric3Dv2 (metric
depth).  Their released weights are torch checkpoints this framework does
not consume, so this module provides the data paths + optimization loops
to fit our native estimators (synth/calibration.py::CameraNet and the
Depth-Anything metric head) from scratch or from converted backbones:

1. ``train_camera_net`` — self-supervised homography-warp bootstrap:
   any folder of (approximately upright) photos becomes a labeled
   (roll, pitch, vfov) regression dataset by rendering each image
   through a *virtual rotated camera* with known parameters — the same
   trick PerspectiveFields uses to mint training data from panoramas
   (their crops have known camera params by construction).  No
   annotations needed; the label is the sampled perturbation.
   Approximation note: real source photos have unknown (small) roll and
   pitch, so learned predictions are relative to the typical upright
   photo; PerspectiveFields' panorama crops avoid this bias at the cost
   of needing 360-degree sources.

2. ``train_metric_depth`` — supervised fine-tune of the Depth-Anything
   metric head on an RGBD manifest (JSONL: {"image": path, "depth":
   .npy path in meters, "fx": focal px}), with targets mapped into the
   *canonical camera* exactly as the serving wrapper expects
   (synth/models.py::make_metric_depth_model, the Metric3Dv2 contract:
   canonical = metric * canonical_focal / (fx * resize_scale)), trained
   with the scale-invariant log (SiLog) loss Metric3D/Depth-Anything-V2
   use for their metric heads.

Both loops are plain optax-AdamW jitted steps; checkpoints are
numpy-savez pytrees loadable by the pipeline adapters.
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.synth import calibration as calib

# ---------------------------------------------------------------------------
# Virtual-camera warp (the self-supervision data path)
# ---------------------------------------------------------------------------


def _k_matrix(size: int, vfov_deg: float) -> np.ndarray:
    f = 0.5 * size / math.tan(math.radians(vfov_deg) / 2)
    c = (size - 1) / 2.0
    return np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]])


def _rotation(roll_deg: float, pitch_deg: float) -> np.ndarray:
    r, p = math.radians(roll_deg), math.radians(pitch_deg)
    rz = np.array(
        [[math.cos(r), -math.sin(r), 0], [math.sin(r), math.cos(r), 0], [0, 0, 1.0]]
    )
    rx = np.array(
        [[1, 0, 0], [0, math.cos(p), -math.sin(p)], [0, math.sin(p), math.cos(p)]]
    )
    return rz @ rx  # roll about the optical axis, pitch about x


def warp_virtual_camera(
    image: np.ndarray,
    roll_deg: float,
    pitch_deg: float,
    src_vfov_deg: float,
    dst_vfov_deg: float,
    out_size: int,
) -> np.ndarray:
    """Render ``image`` (assumed upright, square, ``src_vfov_deg``) through a
    virtual camera rotated by (roll, pitch) with ``dst_vfov_deg``.

    Inverse bilinear warp through H = K_src @ R^-1 @ K_dst^-1 (edge clamp);
    pixels are float32 in the image's own range."""
    img = np.asarray(image, np.float32)
    s = img.shape[0]
    k_src = _k_matrix(s, src_vfov_deg)
    k_dst = _k_matrix(out_size, dst_vfov_deg)
    hmat = k_src @ _rotation(roll_deg, pitch_deg).T @ np.linalg.inv(k_dst)

    xs, ys = np.meshgrid(np.arange(out_size), np.arange(out_size))
    rays = np.stack([xs.ravel(), ys.ravel(), np.ones(out_size * out_size)])
    src = hmat @ rays
    u = src[0] / src[2]
    v = src[1] / src[2]
    u = np.clip(u, 0, s - 1)
    v = np.clip(v, 0, s - 1)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    u1 = np.minimum(u0 + 1, s - 1)
    v1 = np.minimum(v0 + 1, s - 1)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    flat = img.reshape(s * s, -1)
    out = (
        flat[v0 * s + u0] * (1 - fu) * (1 - fv)
        + flat[v0 * s + u1] * fu * (1 - fv)
        + flat[v1 * s + u0] * (1 - fu) * fv
        + flat[v1 * s + u1] * fu * fv
    )
    return out.reshape(out_size, out_size, img.shape[2]).astype(np.float32)


def warp_batches(
    images: Sequence[np.ndarray],
    cfg: calib.CameraNetConfig,
    batch_size: int,
    seed: int = 0,
    src_vfov_deg: float = 70.0,
    roll_range: float = 25.0,
    pitch_range: float = 30.0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Endless (pixels, targets) batches: pixels normalized to [-1, 1] like
    ``calibration._prep``; targets (roll_deg, pitch_deg, vfov_deg)."""
    rng = np.random.default_rng(seed)
    sq = []
    for im in images:
        im = np.asarray(im, np.float32)
        s = min(im.shape[:2])
        im = im[: s or 1, : s or 1]
        sq.append(im)
    lo = cfg.vfov_min_deg + 0.1 * (cfg.vfov_max_deg - cfg.vfov_min_deg)
    hi = min(src_vfov_deg - 5.0, cfg.vfov_max_deg)
    while True:
        px = np.empty((batch_size, cfg.image_size, cfg.image_size, 3), np.float32)
        tg = np.empty((batch_size, 3), np.float32)
        for i in range(batch_size):
            im = sq[int(rng.integers(len(sq)))]
            roll = float(rng.uniform(-roll_range, roll_range))
            pitch = float(rng.uniform(-pitch_range, pitch_range))
            vfov = float(rng.uniform(lo, hi))
            w = warp_virtual_camera(im, roll, pitch, src_vfov_deg, vfov, cfg.image_size)
            if w.max() > 1.5:  # uint8-range input
                w = w / 255.0
            px[i] = (w - 0.5) / 0.5
            tg[i] = (roll, pitch, vfov)
        yield px, tg


def _load_image_dir(image_dir: str) -> List[np.ndarray]:
    from PIL import Image

    paths = sorted(
        os.path.join(image_dir, f)
        for f in os.listdir(image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp"))
    )
    if not paths:
        raise ValueError(f"no images under {image_dir}")
    return [np.asarray(Image.open(p).convert("RGB"), np.float32) for p in paths]


# ---------------------------------------------------------------------------
# CameraNet trainer
# ---------------------------------------------------------------------------


def train_camera_net(
    images: Sequence[np.ndarray] | str,
    cfg: Optional[calib.CameraNetConfig] = None,
    steps: int = 20000,
    batch_size: int = 64,
    lr: float = 3e-4,
    weight_decay: float = 0.05,
    warmup: int = 500,
    seed: int = 0,
    ckpt_path: Optional[str] = None,
    log_every: int = 100,
    params=None,
    batches: Optional[Iterator] = None,
) -> Tuple[dict, List[float]]:
    """Fit CameraNet on virtual-camera warps of ``images`` (a directory path
    or in-memory arrays).  Returns (params, loss history)."""
    import optax

    cfg = cfg or calib.CameraNetConfig()
    if batches is None:
        if isinstance(images, str):
            images = _load_image_dir(images)
        batches = warp_batches(images, cfg, batch_size, seed=seed)
    if params is None:
        params = calib.init_params(jax.random.PRNGKey(seed), cfg)

    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(steps, warmup + 1))
    opt = optax.adamw(sched, weight_decay=weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, px, tg):
        loss, grads = jax.value_and_grad(
            lambda p: calib.calib_loss(p, cfg, px, tg)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history: List[float] = []
    for i in range(steps):
        px, tg = next(batches)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(px), jnp.asarray(tg))
        if i % log_every == 0 or i == steps - 1:
            history.append(float(loss))
    if ckpt_path:
        save_params(params, ckpt_path)
    return params, history


# ---------------------------------------------------------------------------
# Metric-depth head trainer (canonical-camera SiLog)
# ---------------------------------------------------------------------------


def silog_loss(
    pred: jax.Array, target: jax.Array, valid: jax.Array, lam: float = 0.5
) -> jax.Array:
    """Scale-invariant log loss (Eigen et al.; Metric3D lambda=0.5) over
    valid (target > 0) pixels."""
    d = (jnp.log(jnp.maximum(pred, 1e-6)) - jnp.log(jnp.maximum(target, 1e-6))) * valid
    n = jnp.maximum(valid.sum(), 1.0)
    return jnp.sqrt(jnp.mean(d * d * valid) * (d.size / n) - lam * (d.sum() / n) ** 2)


def canonicalize_depth(
    depth_m: np.ndarray, fx: float, model_size: int, canonical_focal: float = 1000.0
) -> np.ndarray:
    """Map metric GT into the canonical camera the network predicts in —
    the inverse of make_metric_depth_model's de-canonicalization."""
    h, w = depth_m.shape[:2]
    scale = model_size / max(h, w)
    return depth_m * canonical_focal / (fx * scale)


def rgbd_batches(
    manifest_path: str,
    cfg,
    batch_size: int,
    canonical_focal: float = 1000.0,
    seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(pixels, canonical_target, valid) batches from a JSONL manifest of
    {"image": path, "depth": .npy path (meters), "fx": focal px}.  Images
    keep-ratio resize + center-pad to the model square exactly like the
    serving wrapper; invalid/missing depth pixels get valid=0."""
    from PIL import Image

    from spatialrgpt_tpu.models import ram

    entries = [json.loads(l) for l in open(manifest_path) if l.strip()]
    if not entries:
        raise ValueError(f"empty manifest {manifest_path}")
    rng = np.random.default_rng(seed)
    S = cfg.image_size
    while True:
        px = np.zeros((batch_size, S, S, 3), np.float32)
        tg = np.zeros((batch_size, S, S), np.float32)
        va = np.zeros((batch_size, S, S), np.float32)
        for i in range(batch_size):
            e = entries[int(rng.integers(len(entries)))]
            img = np.asarray(Image.open(e["image"]).convert("RGB"), np.float32)
            dep = np.load(e["depth"]).astype(np.float32)
            h, w = img.shape[:2]
            scale = S / max(h, w)
            nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
            rimg = np.asarray(Image.fromarray(img.astype(np.uint8)).resize((nw, nh), Image.BILINEAR), np.float32)
            rdep = np.asarray(Image.fromarray(dep).resize((nw, nh), Image.NEAREST), np.float32)
            pt, plft = (S - nh) // 2, (S - nw) // 2
            px[i, pt : pt + nh, plft : plft + nw] = (rimg / 255.0 - ram.IMAGENET_MEAN) / ram.IMAGENET_STD
            canon = canonicalize_depth(rdep, float(e["fx"]), S, canonical_focal)
            tg[i, pt : pt + nh, plft : plft + nw] = canon
            va[i, pt : pt + nh, plft : plft + nw] = (rdep > 0).astype(np.float32)
        yield px, tg, va


def train_metric_depth(
    manifest_or_batches,
    cfg,
    params=None,
    steps: int = 10000,
    batch_size: int = 8,
    lr: float = 5e-5,
    weight_decay: float = 0.01,
    warmup: int = 200,
    seed: int = 0,
    canonical_focal: float = 1000.0,
    ckpt_path: Optional[str] = None,
    log_every: int = 50,
    freeze_backbone: bool = False,
) -> Tuple[dict, List[float]]:
    """Fine-tune the Depth-Anything metric head (models/depth_anything.py,
    cfg.metric=True) toward canonical-camera GT with SiLog.  Start from a
    converted DA backbone when available; ``freeze_backbone`` trains the
    DPT head only (the Metric3D recipe for small datasets)."""
    import optax

    from spatialrgpt_tpu.models import depth_anything as da

    if isinstance(manifest_or_batches, str):
        batches = rgbd_batches(
            manifest_or_batches, cfg, batch_size, canonical_focal, seed
        )
    else:
        batches = manifest_or_batches
    if params is None:
        params = da.init_params(jax.random.PRNGKey(seed), cfg)

    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(steps, warmup + 1))
    opt = optax.adamw(sched, weight_decay=weight_decay)
    opt_state = opt.init(params)

    def loss_fn(p, px, tg, va):
        if freeze_backbone:
            p = {
                k: (v if k == "head" else jax.tree_util.tree_map(jax.lax.stop_gradient, v))
                for k, v in p.items()
            }
        pred = da.forward_depth(p, px, cfg)
        return silog_loss(pred, tg, va)

    @jax.jit
    def step(params, opt_state, px, tg, va):
        loss, grads = jax.value_and_grad(loss_fn)(params, px, tg, va)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history: List[float] = []
    for i in range(steps):
        px, tg, va = next(batches)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(px), jnp.asarray(tg), jnp.asarray(va)
        )
        if i % log_every == 0 or i == steps - 1:
            history.append(float(loss))
    if ckpt_path:
        save_params(params, ckpt_path)
    return params, history


# ---------------------------------------------------------------------------
# Checkpoint helpers (flat npz pytrees, like train/lora.py adapters)
# ---------------------------------------------------------------------------


def save_params(params, path: str) -> None:
    flat = {
        "/".join(str(k.key) if hasattr(k, "key") else str(k.idx) for k in kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez(path, **flat)


def load_params(path: str, like) -> dict:
    """Load an npz saved by save_params into the structure of ``like``."""
    data = np.load(path)
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for kp, v in leaves_kp:
        key = "/".join(str(k.key) if hasattr(k, "key") else str(k.idx) for k in kp)
        leaves.append(jnp.asarray(data[key], np.asarray(v).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("camera", help="fit CameraNet on an image folder")
    c.add_argument("image_dir")
    c.add_argument("--steps", type=int, default=20000)
    c.add_argument("--batch", type=int, default=64)
    c.add_argument("--lr", type=float, default=3e-4)
    c.add_argument("--out", default="camera_net.npz")
    d = sub.add_parser("depth", help="fine-tune the metric-depth head")
    d.add_argument("manifest")
    d.add_argument("--steps", type=int, default=10000)
    d.add_argument("--batch", type=int, default=8)
    d.add_argument("--lr", type=float, default=5e-5)
    d.add_argument("--freeze-backbone", action="store_true")
    d.add_argument("--out", default="metric_depth.npz")
    args = ap.parse_args()
    if args.cmd == "camera":
        _, hist = train_camera_net(
            args.image_dir, steps=args.steps, batch_size=args.batch, lr=args.lr,
            ckpt_path=args.out,
        )
    else:
        from spatialrgpt_tpu.models.depth_anything import DepthAnythingConfig

        _, hist = train_metric_depth(
            args.manifest, DepthAnythingConfig(metric=True), steps=args.steps,
            batch_size=args.batch, lr=args.lr, ckpt_path=args.out,
            freeze_backbone=args.freeze_backbone,
        )
    print(f"final loss {hist[-1]:.4f} (from {hist[0]:.4f})")
