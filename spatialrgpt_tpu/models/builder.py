"""Model loading for inference/serving.

Rebuild of the reference loader (llava/model/builder.py:36-240):
composite checkpoint directory -> (tokenizer, params, config, processor).
Adds the ``<mask>``/``<depth>`` tokens to the tokenizer and records their
ids in the config (reference records them into the vision-tower config,
builder.py:186-192; here they are first-class config fields).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp

from spatialrgpt_tpu.config import SpatialRGPTConfig
from spatialrgpt_tpu.constants import DEFAULT_DEPTH_TOKEN, DEFAULT_MASK_TOKEN
from spatialrgpt_tpu.data.preprocess import SiglipProcessor
from spatialrgpt_tpu.utils.checkpoint import load_reference_checkpoint


def get_model_name_from_path(model_path: str) -> str:
    model_path = model_path.strip("/")
    parts = model_path.split("/")
    if parts[-1].startswith("checkpoint-"):
        return parts[-2] + "_" + parts[-1]
    return parts[-1]


def load_tokenizer(model_path: str, model_max_length: Optional[int] = None):
    """Tokenizer from ``{root}/llm`` (HF layout), with the region special
    tokens added (ids appended at the end of the vocab)."""
    from transformers import AutoTokenizer

    llm_dir = os.path.join(model_path, "llm")
    tok_dir = llm_dir if os.path.isdir(llm_dir) else model_path
    tokenizer = AutoTokenizer.from_pretrained(tok_dir, use_fast=True)
    if model_max_length:
        tokenizer.model_max_length = model_max_length
    added = tokenizer.add_tokens([DEFAULT_MASK_TOKEN, DEFAULT_DEPTH_TOKEN], special_tokens=True)
    mask_id = tokenizer.convert_tokens_to_ids(DEFAULT_MASK_TOKEN)
    depth_id = tokenizer.convert_tokens_to_ids(DEFAULT_DEPTH_TOKEN)
    return tokenizer, mask_id, depth_id, added


def load_pretrained_model(
    model_path: str,
    dtype=jnp.bfloat16,
) -> Tuple[object, dict, SpatialRGPTConfig, SiglipProcessor]:
    """Composite checkpoint -> (tokenizer, params, cfg, image processor)."""
    cfg = SpatialRGPTConfig.load(model_path)
    tokenizer, mask_id, depth_id, added = load_tokenizer(
        model_path, cfg.model_max_length
    )
    cfg = cfg.replace(
        mask_token_id=mask_id,
        depth_token_id=depth_id,
        num_extra_tokens=max(cfg.num_extra_tokens, len(tokenizer) - cfg.llm.vocab_size),
    )
    params = load_reference_checkpoint(model_path, cfg, dtype=dtype)
    # pad the embedding table if the tokenizer grew past the stored vocab
    vocab_rows = params["llm"]["embed_tokens"].shape[0]
    need = len(tokenizer)
    if need > vocab_rows:
        pad = jnp.zeros((need - vocab_rows, params["llm"]["embed_tokens"].shape[1]), dtype)
        mean = params["llm"]["embed_tokens"].mean(axis=0, keepdims=True).astype(dtype)
        params["llm"]["embed_tokens"] = jnp.concatenate(
            [params["llm"]["embed_tokens"], pad + mean], axis=0
        )
        if "lm_head" in params["llm"]:
            k = params["llm"]["lm_head"]["kernel"]
            head_mean = k.mean(axis=1, keepdims=True).astype(dtype)
            params["llm"]["lm_head"]["kernel"] = jnp.concatenate(
                [k, jnp.broadcast_to(head_mean, (k.shape[0], need - k.shape[1])).astype(dtype)],
                axis=1,
            )
    processor = SiglipProcessor(size=cfg.vision.image_size)
    return tokenizer, params, cfg, processor
