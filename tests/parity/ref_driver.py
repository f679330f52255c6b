"""Reference-side parity driver.

Runs the PyTorch reference's OWN model code (llava_arch /
llava_llama / mm_utils / conversation) on CPU against a composite
checkpoint exported by ``spatialrgpt_tpu.utils.export.save_composite_hf``
and a SpatialRGPT-Bench-format annotation file, writing per-round
greedy answers + the prefill last-position logits.

This mirrors ``/root/reference/llava/eval/eval_spatial.py:109-260`` with
the cuda placements removed (CPU, float32) and the depth model replaced
by precomputed depth PNGs (the same ones the TPU-side runner reads) —
everything else (mask decode, SiglipImageProcessor preprocessing, conv
template accumulation, tokenizer_image_token, HF greedy generate) is the
reference's code path.

Run as a subprocess (torch + the reference package stay out of the test
process):

    python ref_driver.py --ckpt <dir> --annotations <json> \
        --image-folder <dir> --depth-folder <dir> --out <jsonl> \
        --logits-out <npz> --conv-mode v1 --max-new 12

Offline import shims for the reference's unused heavy deps live in
``_stubs/`` (s2wrapper, torchvision, flash_attn, deepspeed,
pycocotools-over-our-RLE).
"""

import argparse
import copy
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_HERE, "..", ".."))
sys.path.insert(0, os.path.join(_HERE, "_stubs"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, _REPO)

import numpy as np


def pad_to_square(array):
    # eval_spatial.py:60-69
    H, W = array.shape
    m = max(H, W)
    out = np.zeros((m, m), dtype=np.uint8)
    out[(m - H) // 2 : (m - H) // 2 + H, (m - W) // 2 : (m - W) // 2 + W] = array
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--image-folder", required=True)
    ap.add_argument("--depth-folder", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--logits-out", default="")
    ap.add_argument("--conv-mode", default="v1")
    ap.add_argument("--max-new", type=int, default=12)
    ap.add_argument(
        "--dtype",
        default="float32",
        choices=["float32", "bfloat16"],
        help="model compute dtype (the scale-parity fixture runs bf16 legs "
        "to measure accumulated release-shape drift, PARITY.md)",
    )
    args = ap.parse_args()

    import torch
    from PIL import Image
    from transformers import AutoConfig

    from llava.constants import IMAGE_TOKEN_INDEX
    from llava.conversation import SeparatorStyle, conv_templates
    from llava.mm_utils import process_images, tokenizer_image_token
    from llava.model.language_model.llava_llama import LlavaLlamaModel
    from pycocotools import mask as cocomask  # the _stubs RLE shim

    dtype = {"float32": torch.float32, "bfloat16": torch.bfloat16}[args.dtype]
    cfg = AutoConfig.from_pretrained(args.ckpt)
    cfg.resume_path = args.ckpt
    cfg.model_dtype = f"torch.{args.dtype}"
    cfg._name_or_path = args.ckpt
    model = LlavaLlamaModel(config=cfg).eval().to(dtype)
    tokenizer = model.tokenizer
    image_processor = model.vision_tower.image_processor

    # eval_spatial.py:129-132
    mask_processer = copy.deepcopy(image_processor)
    mask_processer.do_normalize = False
    mask_processer.do_convert_rgb = False
    mask_processer.rescale_factor = 1.0

    with open(args.annotations) as f:
        questions = json.load(f)

    stop_str = (
        conv_templates[args.conv_mode].sep
        if conv_templates[args.conv_mode].sep_style != SeparatorStyle.TWO
        else conv_templates[args.conv_mode].sep2
    )

    records = []
    logit_dumps = {}
    for line in questions:
        image_info = line["image_info"]
        image_file = image_info["file_path"]

        # masks: rle first, bbox fallback (eval_spatial.py:143-180)
        masks = []
        aspect = getattr(model.config, "image_aspect_ratio", None)
        if "rle" in line:
            for rle in line["rle"]:
                m = cocomask.decode(rle).astype(np.uint8)
                if aspect == "pad":
                    m = pad_to_square(m)
                masks.append(m)
        else:
            for bbox in line["bbox"]:
                zero = np.zeros((image_info["height"], image_info["width"]), np.uint8)
                x1, y1, x2, y2 = map(int, bbox)
                zero[y1:y2, x1:x2] = 1
                if aspect == "pad":
                    zero = pad_to_square(zero)
                masks.append(zero)
        if masks:
            pts = [
                mask_processer.preprocess(m[None, ...], return_tensors="pt")[
                    "pixel_values"
                ][0]
                for m in masks
            ]
            masks_t = torch.vstack(pts).to(dtype)
        else:
            masks_t = None

        image = Image.open(os.path.join(args.image_folder, image_file)).convert("RGB")
        depth_path = os.path.join(
            args.depth_folder, os.path.splitext(image_file)[0] + ".png"
        )
        depth = Image.open(depth_path).convert("RGB")

        images_tensor = process_images([image], image_processor, model.config).to(dtype)
        depths_tensor = process_images([depth], image_processor, model.config).to(dtype)

        conv = conv_templates[args.conv_mode].copy()
        conversations = line["conversations"]
        for qi in range(len(conversations) // 2):
            question = conversations[qi * 2]["value"]
            question, _ = re.subn(r"<mask>", "<mask> <depth>", question)
            conv.append_message(conv.roles[0], question)
            conv.append_message(conv.roles[1], None)
            prompt = conv.get_prompt()

            input_ids = tokenizer_image_token(
                prompt, tokenizer, IMAGE_TOKEN_INDEX, return_tensors="pt"
            ).unsqueeze(0)

            with torch.inference_mode():
                out = model.generate(
                    input_ids,
                    images=images_tensor,
                    depths=depths_tensor,
                    masks=[masks_t] if masks_t is not None else None,
                    do_sample=False,
                    max_new_tokens=args.max_new,
                    use_cache=True,
                )
                if args.logits_out:
                    # prefill last-position logits: the first-divergence
                    # tensor for the parity report
                    # signature: (input_ids, position_ids, attention_mask,
                    # past_key_values, labels, images, masks, depths)
                    (_, _, _, _, inputs_embeds, _) = (
                        model.prepare_inputs_labels_for_multimodal(
                            input_ids,
                            None,
                            None,
                            None,
                            None,
                            images_tensor,
                            [masks_t] if masks_t is not None else None,
                            depths_tensor,
                        )
                    )
                    logits = model.llm(inputs_embeds=inputs_embeds).logits
                    logit_dumps[f"{line['id']}_r{qi}"] = (
                        logits[0, -1].float().numpy()
                    )
                    # spliced pre-decoder embeddings: localizes any drift
                    # to towers/projector/region/splice vs the decoder
                    logit_dumps[f"{line['id']}_r{qi}_embeds"] = (
                        inputs_embeds[0].float().numpy()
                    )

            text = tokenizer.batch_decode(out, skip_special_tokens=True)[0].strip()
            if text.endswith(stop_str):
                text = text[: -len(stop_str)]
            text = text.strip()
            records.append(
                {
                    "question_id": line["id"],
                    "round": qi,
                    "prompt": prompt,
                    "output_ids": out[0].tolist(),
                    "pred": text,
                    "gt": conversations[qi * 2 + 1]["value"],
                }
            )

    with open(args.out, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    if args.logits_out:
        np.savez(args.logits_out, **logit_dumps)
    print(f"wrote {len(records)} records")


if __name__ == "__main__":
    main()
