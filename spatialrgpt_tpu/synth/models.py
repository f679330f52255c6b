"""Model wrappers for the synth pipeline stages.

The reference osdsynth hardwires RAM + GroundingDINO + SAM + Metric3D
(processor/segment.py:26-46, pointcloud.py); here each stage is a plain
callable built from the corresponding TPU model:

  tagger    = RAM-style open-set tagger        (models/ram.py)
  detector  = OWL-ViT open-vocab grounding      (models/owl_vit.py)
  segmenter = SAM box-prompted masks            (models/sam.py)
  depth     = Depth-Anything metric/relative    (models/depth_anything.py)

``build_stage_models`` assembles the kwargs for synth.SynthPipeline.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.models import depth_anything as da
from spatialrgpt_tpu.models import owl_vit, ram, sam

# SAM input normalization (HF SamProcessor pixel mean/std on 0-255 input)
SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


def _to_uint8(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * (255.0 if img.max() <= 1.5 else 1.0), 0, 255).astype(np.uint8)
    return img


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR), np.float32)


def make_sam_segmenter(params, cfg: sam.SamConfig) -> Callable:
    """(image, [xyxy pixel boxes]) -> [(H, W) bool masks] — the
    get_sam_segmentation_from_xyxy contract (segment.py:99-101)."""
    fwd = jax.jit(lambda p, x, b: sam.predict_boxes(p, cfg, x, b))

    def segmenter(image: np.ndarray, boxes: Sequence[np.ndarray]) -> List[np.ndarray]:
        if len(boxes) == 0:
            return []
        img = _to_uint8(image)
        H, W = img.shape[:2]
        S = cfg.vision.image_size
        x = (_resize(img, S) - SAM_MEAN) / SAM_STD
        scale = np.array([S / W, S / H, S / W, S / H], np.float32)
        b = np.asarray(boxes, np.float32).reshape(1, len(boxes), 4) * scale
        masks, _ = fwd(params, jnp.asarray(x)[None], jnp.asarray(b))
        masks = np.asarray(masks)  # (N, 4g, 4g) logits
        from PIL import Image

        out = []
        for m in masks:
            mm = np.asarray(
                Image.fromarray(m.astype(np.float32)).resize((W, H), Image.BILINEAR)
            )
            out.append(mm > 0.0)
        return out

    return segmenter


def make_depth_model(params, cfg: da.DepthAnythingConfig) -> Callable:
    """image -> (H, W) float32 depth (Metric3Dv2 slot in LiftStage)."""
    fwd = jax.jit(lambda p, x: da.forward_depth(p, x, cfg))

    def depth_model(image: np.ndarray) -> np.ndarray:
        img = _to_uint8(image)
        H, W = img.shape[:2]
        S = cfg.image_size
        x = (_resize(img, S) / 255.0 - ram.IMAGENET_MEAN) / ram.IMAGENET_STD
        d = np.asarray(fwd(params, jnp.asarray(x)[None]))[0]
        from PIL import Image

        return np.asarray(Image.fromarray(d.astype(np.float32)).resize((W, H), Image.BILINEAR))

    return depth_model


def build_stage_models(
    *,
    ram_params=None,
    ram_cfg: Optional[ram.RamConfig] = None,
    ram_tags: Optional[Sequence[str]] = None,
    owl_params=None,
    owl_cfg: Optional[owl_vit.OwlViTConfig] = None,
    owl_tokenize: Optional[Callable] = None,
    sam_params=None,
    sam_cfg: Optional[sam.SamConfig] = None,
    depth_params=None,
    depth_cfg: Optional[da.DepthAnythingConfig] = None,
    box_threshold: float = 0.25,
    **tagger_kwargs,
) -> Dict[str, Callable]:
    """Assemble SynthPipeline stage_models from whichever models are given."""
    models: Dict[str, Callable] = {}
    if ram_params is not None:
        models["tagger"] = ram.make_tagger(ram_params, ram_cfg, ram_tags, **tagger_kwargs)
    if owl_params is not None:
        models["detector"] = owl_vit.make_detector(
            owl_params, owl_cfg, owl_tokenize, box_threshold=box_threshold
        )
    if sam_params is not None:
        models["segmenter"] = make_sam_segmenter(sam_params, sam_cfg)
    if depth_params is not None:
        models["depth_model"] = make_depth_model(depth_params, depth_cfg)
    return models
