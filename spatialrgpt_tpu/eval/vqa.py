"""Generic VQA evaluation runners.

Rebuild of llava/eval/model_vqa.py (image + question jsonl -> answers
jsonl) and model_qa.py (text-only) on the batched TPU generate path.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.constants import DEFAULT_IMAGE_TOKEN, NUM_TOKENS_PER_IMAGE
from spatialrgpt_tpu.conversation import conv_templates
from spatialrgpt_tpu.data import preprocess as pp
from spatialrgpt_tpu.data.splice import expand_rows
from spatialrgpt_tpu.data.tokenize import tokenizer_image_token
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.serving.generate import generate


@dataclass
class VQAConfig:
    question_file: str = ""
    image_folder: str = ""
    answers_file: str = "answers.jsonl"
    conv_mode: str = "llama_3"
    batch_size: int = 16
    max_new_tokens: int = 128
    prompt_bucket: int = 1024
    temperature: float = 0.0
    num_chunks: int = 1
    chunk_idx: int = 0


def run_vqa(vcfg: VQAConfig, model) -> str:
    """questions jsonl: {question_id, image, text}; writes {question_id,
    prompt, text, model_id} answer lines (model_vqa.py contract)."""
    tokenizer, params, cfg, processor = model
    with open(vcfg.question_file) as f:
        questions = [json.loads(l) for l in f if l.strip()]
    size = (len(questions) + vcfg.num_chunks - 1) // vcfg.num_chunks
    questions = questions[vcfg.chunk_idx * size : (vcfg.chunk_idx + 1) * size]

    os.makedirs(os.path.dirname(vcfg.answers_file) or ".", exist_ok=True)
    out = open(vcfg.answers_file, "w")

    for start in range(0, len(questions), vcfg.batch_size):
        chunk = questions[start : start + vcfg.batch_size]
        rows, images = [], []
        for q in chunk:
            text = q["text"]
            if DEFAULT_IMAGE_TOKEN not in text:
                text = DEFAULT_IMAGE_TOKEN + "\n" + text
            conv = conv_templates[vcfg.conv_mode].copy()
            conv.append_message(conv.roles[0], text)
            conv.append_message(conv.roles[1], None)
            ids = np.asarray(tokenizer_image_token(conv.get_prompt(), tokenizer), np.int64)
            rows.append(ids)
            images.append(
                pp.process_image(
                    os.path.join(vcfg.image_folder, q["image"]), processor, cfg.image_aspect_ratio
                )
            )

        sb = expand_rows(
            rows,
            None,
            max_len=cfg.model_max_length,
            tokens_per_image=NUM_TOKENS_PER_IMAGE,
            mask_token_id=cfg.mask_token_id,
            depth_token_id=cfg.depth_token_id,
            pad_to=vcfg.prompt_bucket,
        )
        n = len(chunk)
        imgs = jnp.asarray(np.stack(images), jnp.bfloat16)
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
            images=imgs,
            depths=None,
            masks=None,
            mask_valid=None,
        )
        result = generate(
            params,
            cfg,
            inputs,
            jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32),
            max_new_tokens=vcfg.max_new_tokens,
            temperature=vcfg.temperature,
        )
        toks = np.asarray(result.tokens)
        for i, q in enumerate(chunk):
            ids = toks[i].tolist()
            if cfg.llm.eos_token_id in ids:
                ids = ids[: ids.index(cfg.llm.eos_token_id)]
            text = tokenizer.decode(ids, skip_special_tokens=True).strip()
            out.write(
                json.dumps(
                    {
                        "question_id": q.get("question_id", start + i),
                        "prompt": q["text"],
                        "text": text,
                        "model_id": "spatialrgpt-tpu",
                    }
                )
                + "\n"
            )
    out.close()
    return vcfg.answers_file
