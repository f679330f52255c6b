"""Region classification evaluation (COCO / ODinW protocol).

Rebuild of llava/eval/eval_region_cls.py: per annotated region, crop a
square window centered on the region box (short-side crop,
eval_region_cls.py:49-72), build a ``<mask>`` classification prompt from
the 15-paraphrase bank, decode, and score predictions against category
names (substring match, the RegionCLIP protocol of eval_coco_obo.py).
The 15-prompt bank is part of the eval contract (the model's inputs must
match for comparable numbers), so the prompt strings are mirrored
verbatim like the token constants; all code is new.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from spatialrgpt_tpu.constants import DEFAULT_IMAGE_TOKEN

PROMPTS = [
    "Identify the object or feature present in the region denoted by <mask>.",
    "What category best describes the area represented by <mask>?",
    "Describe the content of the image section highlighted by <mask>.",
    "Can you specify the type of object or landscape within the bounds of <mask>?",
    "Which of the following categories best fits the region marked by <mask>? Provide your answer.",
    "What can you discern from the area indicated by <mask> in the image?",
    "Categorize the visual element within the area designated by <mask>.",
    "Give a brief description of the item or scene captured in the segment marked by <mask>.",
    "Which classification would you assign to the visual content found at <mask>?",
    "Determine and describe the primary subject located within <mask>.",
    "How would you label the section of the image encompassed by <mask>?",
    "Assess and classify the feature present within the confines of <mask>.",
    "If you were to tag the section indicated by <mask>, what tag would you use?",
    "What stands out to you in the region demarcated by <mask>? Please classify it.",
    "Evaluate the content of the image portion pinpointed by <mask> and provide its category.",
]


def get_crop_box(bboxes: List[List[float]], image_info: Dict) -> List[int]:
    """Square, short-side-sized crop centered on the first region box
    (eval_region_cls.py:49-72 semantics, including the full-image
    fallback for oversized regions)."""
    short = min(image_info["height"], image_info["width"])
    bbox = bboxes[0]
    if bbox[3] - bbox[1] > short or bbox[2] - bbox[0] > short:
        return [0, 0, image_info["width"], image_info["height"]]
    cx, cy = int((bbox[0] + bbox[2]) / 2), int((bbox[1] + bbox[3]) / 2)
    x_left, x_right = cx - short // 2, cx + short // 2
    y_top, y_bottom = cy - short // 2, cy + short // 2
    if x_left < 0:
        x_left, x_right = 0, short
    if x_right > short:
        x_left, x_right = image_info["width"] - short, image_info["width"]
    if y_top < 0:
        y_top, y_bottom = 0, short
    if y_bottom > short:
        y_top, y_bottom = image_info["height"] - short, image_info["height"]
    return [x_left, y_top, x_right, y_bottom]


def score_region_predictions(
    records: List[Dict], categories: Optional[List[str]] = None
) -> Dict[str, float]:
    """records: [{pred, gt_category}]; accuracy = gt name appears in the
    prediction (case-insensitive), the one-by-one COCO scorer protocol."""
    correct = 0
    per_cat = {}
    for r in records:
        gt = r["gt_category"].lower()
        hit = gt in r["pred"].lower()
        correct += int(hit)
        c = per_cat.setdefault(gt, [0, 0])
        c[0] += int(hit)
        c[1] += 1
    out = {"accuracy": 100.0 * correct / max(len(records), 1)}
    for cat, (h, n) in sorted(per_cat.items()):
        out[f"acc_{cat}"] = 100.0 * h / n
    return out


def coco_annotation_to_items(coco_json: Dict) -> List[Dict]:
    """COCO instances json -> per-annotation eval items
    (eval_region_cls.py:98-147 generate_data_list)."""
    id_to_img = {im["id"]: im for im in coco_json["images"]}
    id_to_cat = {c["id"]: c["name"] for c in coco_json["categories"]}
    items = []
    for ann in coco_json["annotations"]:
        if ann.get("iscrowd", 0):
            continue
        im = id_to_img[ann["image_id"]]
        x, y, w, h = ann["bbox"]
        items.append(
            {
                "file_name": im["file_name"],
                "image_info": {"height": im["height"], "width": im["width"]},
                "bbox": [x, y, x + w, y + h],
                "segmentation": ann.get("segmentation"),
                "category": id_to_cat[ann["category_id"]],
            }
        )
    return items
