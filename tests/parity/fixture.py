"""Shared fixtures for the cross-framework parity gate.

Builds (a) an offline byte-level tokenizer loadable by BOTH the reference's
slow-tokenizer path (llava/model/language_model/builder.py:86-93,
``use_fast=False`` — sentencepiece is unavailable offline, so the files are
GPT2Tokenizer-format byte-level BPE with no merges) and our fast path
(models/builder.py:load_tokenizer), (b) a tiny composite checkpoint written
through ``utils/export.save_composite_hf`` in the reference's own directory
layout, and (c) a SpatialRGPT-Bench-format annotation/image/depth fixture.

Fixture images are written at NON-native sizes: our numpy preprocess
reproduces PIL's fixed-point bicubic bit-for-bit
(data/preprocess.pil_bicubic_resize, gated by test_preprocess.py), so the
parity gate covers the full chain including the resize kernel — no
pre-sizing crutch.
"""

from __future__ import annotations

import json
import os

import numpy as np

TINY_SEED = 20260817
IMAGE_SIZE = 98  # patch 14 -> 7x7 tower grid; deconv2x -> 28; ada pool -> 27


def bytes_to_unicode():
    """GPT-2's byte<->unicode table (printable bytes map to themselves,
    the rest shift past 0x100)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def write_byte_tokenizer(tok_dir: str) -> int:
    """Write GPT2-format byte-level tokenizer files: specials 0..2, the 256
    byte symbols at 3..258, ``<mask>``/``<depth>`` added at 259/260.
    Returns the total vocab size (261)."""
    os.makedirs(tok_dir, exist_ok=True)
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for ch in bytes_to_unicode().values():
        vocab[ch] = len(vocab)
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(tok_dir, "added_tokens.json"), "w") as f:
        json.dump({"<mask>": 259, "<depth>": 260}, f)
    special = {
        "bos_token": "<s>",
        "eos_token": "</s>",
        "unk_token": "<unk>",
        "pad_token": "</s>",
        "additional_special_tokens": ["<mask>", "<depth>"],
    }
    with open(os.path.join(tok_dir, "special_tokens_map.json"), "w") as f:
        json.dump(special, f)
    cfg = {
        "tokenizer_class": "GPT2Tokenizer",
        "model_max_length": 4096,
        "add_prefix_space": False,
        "add_bos_token": False,
        **{k: v for k, v in special.items() if k != "additional_special_tokens"},
    }
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump(cfg, f)
    return len(vocab) + 2


def tiny_config():
    """A tiny SpatialRGPTConfig whose reference-side twin is loadable by
    stock HF classes: ada_pool_size stays 27 (hardcoded in the reference,
    base_extractor.py:127), so tokens/image is the production 196."""
    from spatialrgpt_tpu.config import (
        LlamaConfig,
        ProjectorConfig,
        RegionExtractorConfig,
        SiglipVisionConfig,
        SpatialRGPTConfig,
    )

    return SpatialRGPTConfig(
        llm=LlamaConfig(
            vocab_size=259,
            hidden_size=48,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=4096,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            bos_token_id=1,
            eos_token_id=2,
        ),
        vision=SiglipVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=IMAGE_SIZE,
            patch_size=14,
        ),
        projector=ProjectorConfig(mm_hidden_size=32, hidden_size=48),
        region=RegionExtractorConfig(mm_hidden_size=32, hidden_size=48),
        mask_token_id=259,
        depth_token_id=260,
        image_aspect_ratio="resize",
        model_max_length=4096,
        num_extra_tokens=2,
    )


def scale_config():
    """Release-shape synthetic config for the scale-parity fixture
    (VERDICT r2 #2): the REAL SigLIP-so400m tower dims (27L / hidden 1152 /
    ffn 4304 / 16 heads / 384px / patch 14 -> 729 tower tokens, the
    production tokens-per-image contract) on top of a 16-layer hidden-2048
    GQA decoder (16q/8kv, ffn 5632) — deep/wide enough that bf16
    accumulation drift across the stack is measured, not extrapolated,
    while staying runnable on the offline single-core host (~1.2B params).
    Weights are synthetic (fixed seed); the released checkpoints cannot be
    fetched offline."""
    from spatialrgpt_tpu.config import (
        LlamaConfig,
        ProjectorConfig,
        RegionExtractorConfig,
        SiglipVisionConfig,
        SpatialRGPTConfig,
    )

    return SpatialRGPTConfig(
        llm=LlamaConfig(
            vocab_size=259,
            hidden_size=2048,
            intermediate_size=5632,
            num_hidden_layers=16,
            num_attention_heads=16,
            num_key_value_heads=8,
            max_position_embeddings=4096,
            rms_norm_eps=1e-5,
            rope_theta=500000.0,
            bos_token_id=1,
            eos_token_id=2,
        ),
        vision=SiglipVisionConfig(),  # stock so400m dims incl. 384px
        projector=ProjectorConfig(mm_hidden_size=1152, hidden_size=2048),
        region=RegionExtractorConfig(mm_hidden_size=1152, hidden_size=2048),
        mask_token_id=259,
        depth_token_id=260,
        image_aspect_ratio="resize",
        model_max_length=4096,
        num_extra_tokens=2,
    )


def export_scale_checkpoint(root: str) -> str:
    """Init scale-fixture params (fixed seed, f32 master so both frameworks
    cast identically) and write the reference-layout composite checkpoint."""
    import jax
    import jax.numpy as jnp

    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.utils.export import save_composite_hf

    cfg = scale_config()
    params = vlm.init_params(jax.random.PRNGKey(TINY_SEED), cfg, dtype=jnp.float32)
    save_composite_hf(root, params, cfg)
    write_byte_tokenizer(os.path.join(root, "llm"))
    return root


def export_tiny_checkpoint(root: str) -> str:
    """Init tiny params (fixed seed) and write the reference-layout HF
    composite checkpoint + tokenizer.  Returns ``root``."""
    import jax
    import jax.numpy as jnp

    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.utils.export import save_composite_hf

    cfg = tiny_config()
    params = vlm.init_params(jax.random.PRNGKey(TINY_SEED), cfg, dtype=jnp.float32)
    save_composite_hf(root, params, cfg)
    write_byte_tokenizer(os.path.join(root, "llm"))
    return root


def write_bench_fixture(root: str) -> dict:
    """Images/depths at NON-native sizes + bench-format annotations (both
    frameworks must run their real bicubic resize; ours is PIL-bit-exact).
    Entry 1 has two QA rounds (exercising the accumulated-conversation
    semantics, eval_spatial.py:200-211) and RLE masks; entry 2 uses bbox
    fallback masks."""
    from PIL import Image

    from spatialrgpt_tpu.data.preprocess import rle_encode

    img_dir = os.path.join(root, "images")
    depth_dir = os.path.join(root, "depths")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    sizes = [(130, 110), (87, 143)]  # (H, W), both != IMAGE_SIZE

    for i, (h, w) in enumerate(sizes):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"img{i}.png"))
        dep = rng.randint(0, 256, (h, w), dtype=np.uint8)
        Image.fromarray(np.stack([dep] * 3, -1)).save(
            os.path.join(depth_dir, f"img{i}.png")
        )

    H0, W0 = sizes[0]
    m0 = np.zeros((H0, W0), np.uint8)
    m0[10:50, 12:44] = 1
    m1 = np.zeros((H0, W0), np.uint8)
    m1[40:90, 55:92] = 1
    m2 = np.zeros((H0, W0), np.uint8)
    m2[5:30, 60:95] = 1

    # Contract (implied by llava_arch.py:478-483 mask_embed[:num_mask]):
    # the CUMULATIVE <mask> count across an entry's accumulated rounds
    # equals len(rle) — each round's questions reference fresh regions.
    annotations = [
        {
            "id": "p0",
            "image_info": {"file_path": "img0.png", "height": H0, "width": W0},
            "rle": [rle_encode(np.asfortranarray(m)) for m in (m0, m1, m2)],
            "qa_info": {"type": "qualitative", "category": "left_right"},
            "conversations": [
                {
                    "from": "human",
                    "value": "<image>\nIs <mask> to the left of <mask>?",
                },
                {"from": "gpt", "value": "Yes."},
                {"from": "human", "value": "How wide is <mask>?"},
                {"from": "gpt", "value": "A meter."},
            ],
        },
        {
            "id": "p1",
            "image_info": {
                "file_path": "img1.png",
                "height": sizes[1][0],
                "width": sizes[1][1],
            },
            "bbox": [[8, 6, 40, 60], [50, 30, 95, 80]],
            "qa_info": {"type": "quantitative", "category": "distance"},
            "conversations": [
                {
                    "from": "human",
                    "value": "<image>\nHow far apart are <mask> and <mask>?",
                },
                {"from": "gpt", "value": "Two meters."},
            ],
        },
    ]
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(annotations, f)
    return {
        "annotations": ann_path,
        "image_folder": img_dir,
        "depth_folder": depth_dir,
    }
