"""SpatialRGPT-Bench runner.

Rebuild of llava/eval/eval_spatial.py: loads a composite checkpoint,
builds region masks from rle/bbox annotations, runs batched greedy decode
on TPU, and writes the same jsonl answer records the GPT-4/offline judge
consumes (eval/judge.py).

TPU-first differences from the reference:
  - prompts are bucketed and decoded in fixed-shape batches inside one
    compiled while_loop (no per-sample HF generate),
  - depth maps follow the reference protocol by default: Depth-Anything
    (models/depth_anything.py DepthPredictor) runs once per unique image,
    batched by resized shape, and the colorized uint8x3 map feeds the
    image processor exactly like eval_spatial.py:192-198.  A precomputed
    depth folder overrides per image; reusing RGB as fake depth (the
    training-side fallback, dataset.py:1840-1845) requires the explicit
    ``depth_source="rgb"`` flag.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.constants import NUM_TOKENS_PER_IMAGE
from spatialrgpt_tpu.conversation import SeparatorStyle, conv_templates
from spatialrgpt_tpu.data import preprocess as pp
from spatialrgpt_tpu.data.splice import expand_rows
from spatialrgpt_tpu.data.tokenize import tokenizer_image_token
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.serving.generate import generate


@dataclass
class BenchConfig:
    model_path: str = ""
    annotation_file: str = ""
    image_folder: str = ""
    depth_folder: Optional[str] = None
    answers_file: str = "answers.jsonl"
    conv_mode: str = "llama_3"
    batch_size: int = 32
    max_new_tokens: int = 128
    prompt_bucket: int = 1024
    use_mask: bool = True
    num_chunks: int = 1
    chunk_idx: int = 0
    temperature: float = 0.0
    regions_per_image: int = 8
    kv_quant: bool = False  # int8 KV cache (BASELINE.md: lossless greedy
    # tokens on the test model, halves decode HBM traffic + cache memory)
    w8a8: bool = False  # quantize llm+vision to int8 weights with dynamic
    # int8 activations on expanding kernels (the bench.py serving default;
    # greedy-lossless on the test model — test_w8a8_generate_matches_bf16)
    depth_source: str = "model"  # "model": run Depth-Anything per unique
    # image (the reference's ALWAYS-on protocol, eval_spatial.py:92-106);
    # "rgb": reuse the RGB tensor as fake depth (explicit opt-in only).
    # A depth_folder, when provided, overrides either source per image.
    depth_model_path: str = ""  # HF DepthAnythingForDepthEstimation dir
    # to convert when no predictor instance is passed to run_bench
    tp: int = 1  # tensor-parallel serving: shard the decoder over a
    # tp-way mesh (parallel/mesh.py::tp_shard_params — how models larger
    # than one chip's HBM run this benchmark; token parity vs tp=1 is
    # test-gated)


def get_chunk(lst: List, n: int, k: int) -> List:
    """Contiguous chunking (reference data-parallel eval launcher,
    scripts/srgpt/eval/srgpt_bench.sh:23-49)."""
    size = (len(lst) + n - 1) // n
    return lst[k * size : (k + 1) * size]


def build_prompt(conv_mode: str, question: str) -> str:
    conv = conv_templates[conv_mode].copy()
    question, _ = re.subn(r"<mask>", "<mask> <depth>", question)
    conv.append_message(conv.roles[0], question)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def build_round_prompts(conv_mode: str, conversations: List[Dict]) -> List[str]:
    """Per-round prompts with reference accumulation semantics.

    The reference keeps ONE conversation per bench entry and appends each
    round's question to it (eval_spatial.py:200-211); the assistant slots
    are left ``None`` (the model's answers are never inserted), so round
    ``i``'s prompt is the concatenation of questions 0..i with empty
    assistant turns between them.  Crucially, the ``<image>`` token appears
    only in round 0's question — building a fresh conversation per round
    (the round-1 bug) dropped it from every later round.
    """
    conv = conv_templates[conv_mode].copy()
    prompts = []
    for qi in range(len(conversations) // 2):
        question = conversations[qi * 2]["value"]
        question, _ = re.subn(r"<mask>", "<mask> <depth>", question)
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        prompts.append(conv.get_prompt())
    return prompts


def stop_str_for(conv_mode: str) -> str:
    conv = conv_templates[conv_mode]
    return conv.sep if conv.sep_style != SeparatorStyle.TWO else conv.sep2


def masks_for_line(line: Dict, image_aspect_ratio: str, use_mask: bool) -> List[np.ndarray]:
    info = line["image_info"]
    masks = []
    if use_mask and "rle" in line:
        try:
            for rle in line["rle"]:
                m = pp.rle_decode(rle).astype(np.uint8)
                if image_aspect_ratio == "pad":
                    m = pp.pad_to_square_array(m)
                masks.append(m)
            return masks
        except Exception:
            masks = []
    for bbox in line.get("bbox", []):
        h, w = info["height"], info["width"]
        x1, y1, x2, y2 = (int(max(0, min(v, lim))) for v, lim in zip(bbox, (w, h, w, h)))
        m = np.zeros((h, w), np.uint8)
        m[y1:y2, x1:x2] = 1
        if image_aspect_ratio == "pad":
            m = pp.pad_to_square_array(m)
        masks.append(m)
    return masks


def _build_depth_predictor(bcfg: BenchConfig, depth_model):
    """Resolve the eval-time depth source.  Returns a DepthPredictor, or
    None when depth comes from the folder/rgb paths."""
    if bcfg.depth_source == "rgb":
        return None
    if bcfg.depth_source != "model":
        raise ValueError(f"unknown depth_source {bcfg.depth_source!r}")
    if depth_model is not None:
        return depth_model
    from spatialrgpt_tpu.models import depth_anything as da

    if bcfg.depth_model_path:
        import torch
        from safetensors import safe_open

        dacfg = da.DepthAnythingConfig()
        path = bcfg.depth_model_path
        sd = {}
        st = os.path.join(path, "model.safetensors")
        if os.path.exists(st):
            with safe_open(st, framework="pt") as f:
                sd = {k: f.get_tensor(k) for k in f.keys()}
        else:
            sd = torch.load(
                os.path.join(path, "pytorch_model.bin"), map_location="cpu"
            )
        params = da.convert_depth_anything(sd, dacfg)
        return da.DepthPredictor(params, dacfg)
    raise ValueError(
        "depth_source='model' (the reference protocol) needs a depth "
        "predictor: pass depth_model=, set depth_model_path, or opt out "
        "explicitly with depth_source='rgb' / a depth_folder covering "
        "every image"
    )


def run_bench(bcfg: BenchConfig, model=None, depth_model=None) -> str:
    """Execute the benchmark; returns the answers file path.

    ``model`` may be a preloaded (tokenizer, params, cfg, processor)
    tuple to skip checkpoint loading (tests); ``depth_model`` a
    DepthPredictor instance (models/depth_anything.py)."""
    if model is None:
        from spatialrgpt_tpu.models.builder import load_pretrained_model

        model = load_pretrained_model(bcfg.model_path)
    tokenizer, params, cfg, processor = model
    if bcfg.w8a8:
        from spatialrgpt_tpu.ops.quant import quantize_llm

        params = dict(params)
        params["llm"] = quantize_llm(params["llm"], bits=8, act_quant=True)
        params["vision"] = quantize_llm(params["vision"], bits=8, act_quant=True)
    mesh = rep_sharding = None
    if bcfg.tp > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from spatialrgpt_tpu.parallel.mesh import make_mesh, tp_shard_params

        mesh = make_mesh(tp=bcfg.tp)
        params = tp_shard_params(params, mesh)
        rep_sharding = NamedSharding(mesh, PartitionSpec())

    with open(bcfg.annotation_file) as f:
        questions = json.load(f)
    questions = get_chunk(questions, bcfg.num_chunks, bcfg.chunk_idx)

    os.makedirs(os.path.dirname(bcfg.answers_file) or ".", exist_ok=True)
    ans_file = open(bcfg.answers_file, "w")
    stop_str = stop_str_for(bcfg.conv_mode)

    # flatten: one record per (question, conversation round); the prompt for
    # round i accumulates questions 0..i (reference eval_spatial.py:200-211),
    # and carries no model answers, so all rounds batch independently.
    work = []
    for line in questions:
        conversations = line["conversations"]
        prompts = build_round_prompts(bcfg.conv_mode, conversations)
        for qi, prompt in enumerate(prompts):
            work.append(
                (line, qi, prompt, conversations[qi * 2]["value"], conversations[qi * 2 + 1]["value"])
            )

    predictor = None
    for start in range(0, len(work), bcfg.batch_size):
        chunk = work[start : start + bcfg.batch_size]

        # depth inference batch: every unique image in the chunk without a
        # precomputed depth file runs through Depth-Anything ONCE (the
        # predictor memoizes by path and batches same-shaped images)
        need_depth = {}
        for line, *_ in chunk:
            fp = line["image_info"]["file_path"]
            if bcfg.depth_folder and os.path.exists(
                os.path.join(bcfg.depth_folder, os.path.splitext(fp)[0] + ".png")
            ):
                continue
            if bcfg.depth_source == "model" and fp not in need_depth:
                need_depth[fp] = os.path.join(bcfg.image_folder, fp)
        depth_maps: Dict[str, np.ndarray] = {}
        if need_depth:
            if predictor is None:
                predictor = _build_depth_predictor(bcfg, depth_model)
            from PIL import Image as PILImage

            raws = [
                np.asarray(PILImage.open(p).convert("RGB"))
                for p in need_depth.values()
            ]
            cols = predictor.predict_colorized(raws, keys=list(need_depth))
            depth_maps = dict(zip(need_depth, cols))

        records = []
        rows = []
        images, depths, mask_stacks, valids = [], [], [], []
        for line, qi, prompt, q_text, gt in chunk:
            fp = line["image_info"]["file_path"]
            image_path = os.path.join(bcfg.image_folder, fp)
            image = pp.process_image(image_path, processor, cfg.image_aspect_ratio)
            depth = None
            if bcfg.depth_folder:
                dp = os.path.join(
                    bcfg.depth_folder, os.path.splitext(fp)[0] + ".png"
                )
                if os.path.exists(dp):
                    depth = pp.process_depth(dp, processor, cfg.image_aspect_ratio)
            if depth is None and fp in depth_maps:
                # reference protocol: the colorized map goes through the
                # IMAGE processor (eval_spatial.py:196-198 process_images)
                from PIL import Image as PILImage

                depth = pp.process_image(
                    PILImage.fromarray(depth_maps[fp]), processor,
                    cfg.image_aspect_ratio,
                )
            if depth is None:
                depth = image.copy()

            raw_masks = masks_for_line(line, cfg.image_aspect_ratio, bcfg.use_mask)
            proc_masks = (
                pp.process_masks(raw_masks, processor, cfg.image_aspect_ratio)
                if raw_masks
                else None
            )
            m, v = pp.pad_masks_to_slots(
                proc_masks, bcfg.regions_per_image, processor.size
            )

            ids = np.asarray(tokenizer_image_token(prompt, tokenizer), np.int64)
            rows.append(ids)
            images.append(image)
            depths.append(depth)
            mask_stacks.append(m)
            valids.append(v)
            records.append((line, qi, prompt, q_text, gt))

        sb = expand_rows(
            rows,
            None,
            max_len=cfg.model_max_length,
            tokens_per_image=cfg.tokens_per_image,
            mask_token_id=cfg.mask_token_id,
            depth_token_id=cfg.depth_token_id,
            regions_per_image=bcfg.regions_per_image,
            pad_to=bcfg.prompt_bucket,
        )
        inputs = vlm.VLMInputs(
            input_ids=jnp.asarray(sb.input_ids),
            is_image=jnp.asarray(sb.is_image),
            image_gather_idx=jnp.asarray(sb.image_gather_idx),
            position_ids=jnp.asarray(sb.position_ids),
            segment_ids=jnp.asarray(sb.segment_ids),
            labels=None,
            mask_slot=jnp.asarray(sb.mask_slot),
            is_mask=jnp.asarray(sb.is_mask),
            depth_slot=jnp.asarray(sb.depth_slot),
            is_depth=jnp.asarray(sb.is_depth),
            images=jnp.asarray(np.stack(images), jnp.bfloat16),
            depths=jnp.asarray(np.stack(depths), jnp.bfloat16),
            masks=jnp.asarray(np.stack(mask_stacks), jnp.bfloat16),
            mask_valid=jnp.asarray(np.stack(valids)),
        )
        prompt_lengths = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)
        if rep_sharding is not None:
            # inputs replicate over the tp mesh (params are sharded)
            inputs = jax.tree_util.tree_map(
                lambda t: jax.device_put(t, rep_sharding), inputs
            )
            prompt_lengths = jax.device_put(prompt_lengths, rep_sharding)
        result = generate(
            params,
            cfg,
            inputs,
            prompt_lengths,
            max_new_tokens=bcfg.max_new_tokens,
            temperature=bcfg.temperature,
            kv_quant=bcfg.kv_quant,
        )
        toks = np.asarray(result.tokens)

        for i, (line, qi, _prompt, q_text, gt) in enumerate(records):
            raw_ids = toks[i].tolist()
            out_ids = raw_ids
            if cfg.llm.eos_token_id in out_ids:
                out_ids = out_ids[: out_ids.index(cfg.llm.eos_token_id)]
            text = tokenizer.decode(out_ids, skip_special_tokens=True).strip()
            if text.endswith(stop_str):
                text = text[: -len(stop_str)].strip()
            ans_file.write(
                json.dumps(
                    {
                        "question_id": line["id"],
                        "round": qi,
                        "image": line["image_info"]["file_path"],
                        "question": line.get("text_q", q_text),
                        "pred": text,
                        # raw greedy ids (pre eos-cut) — the cross-framework
                        # parity gate diffs these against the reference
                        # driver's output_ids (tests/parity/ref_driver.py)
                        "output_ids": raw_ids,
                        "gt": gt,
                        "model_id": get_model_name(bcfg.model_path),
                        "qa_info": line["qa_info"],
                    }
                )
                + "\n"
            )
    ans_file.close()
    return bcfg.answers_file


def get_model_name(path: str) -> str:
    from spatialrgpt_tpu.models.builder import get_model_name_from_path

    return get_model_name_from_path(path) if path else "spatialrgpt-tpu"
