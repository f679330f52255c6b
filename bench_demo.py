"""BASELINE config 5: the end-to-end demo graph measured as ONE pipeline.

Real-image flow, all three models on the chip (VERDICT r3 next-#5):
  image -> Depth-Anything ViT-L colorized depth
        -> SAM-HQ (vit_h) box-prompted region masks
        -> VLM region QA (RGB + depth towers, 2 regions, greedy 64 tokens)

This is the reference's Gradio demo flow
(demo/gradio_web_server_multi.py:78-136: SAM-HQ vit_h mask proposal,
Depth-Anything depth, `<regionX>` -> `<mask> <depth>` rewrite, generate)
run as a measured batch pipeline.  Weights are random (throughput does
not depend on values); preprocessing is the production host path
(data/preprocess.py, bit-exact PIL parity).

Prints one JSON line: images/sec end-to-end, per-stage seconds, and the
chip's peak HBM.  Env: SRGPT_DEMO_BATCH (default 8), SRGPT_BENCH_MODEL
(default llama3-8b int8+W8A8), SRGPT_DEMO_SAM (vit_h | vit_b).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("SRGPT_DEMO_TINY", "0") == "1":
    # CPU smoke mode: the environment preloads a TPU platform plugin, so
    # JAX_PLATFORMS alone does not steer off it (tests/conftest.py does
    # the same)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import bench
from spatialrgpt_tpu.config import preset
from spatialrgpt_tpu.constants import IMAGE_TOKEN_INDEX, NUM_TOKENS_PER_IMAGE
from spatialrgpt_tpu.data import preprocess as pp
from spatialrgpt_tpu.data.splice import expand_rows
from spatialrgpt_tpu.models import depth_anything as da
from spatialrgpt_tpu.models import sam as sam_lib
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.serving.generate import generate
from spatialrgpt_tpu.utils.timing import device_sync, time_fn

TINY = os.environ.get("SRGPT_DEMO_TINY", "0") == "1"  # CPU smoke mode
BATCH = int(os.environ.get("SRGPT_DEMO_BATCH", 2 if TINY else 8))
MODEL = os.environ.get("SRGPT_BENCH_MODEL", "llama3-8b")
SAM_SIZE = os.environ.get("SRGPT_DEMO_SAM", "tiny" if TINY else "vit_h")
MAX_NEW = int(os.environ.get("SRGPT_BENCH_MAX_NEW", 4 if TINY else 64))
# demo-realistic input resolution
IMG_H, IMG_W = (96, 128) if TINY else (768, 1024)


def sam_config(size: str) -> sam_lib.SamConfig:
    """Released SAM(-HQ) architecture constants (facebook/sam-vit-*)."""
    if size == "tiny":  # CPU smoke shapes
        return sam_lib.SamConfig(
            vision=sam_lib.SamVisionConfig(
                hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                intermediate_size=128, image_size=64, patch_size=16,
                output_channels=32, window_size=2, global_attn_indexes=(1, 3),
            ),
            prompt_hidden_size=32, image_embedding_size=4,
            decoder_hidden_size=32, decoder_num_heads=2, decoder_mlp_dim=64,
            decoder_layers=2,
        )
    if size == "vit_h":
        vision = sam_lib.SamVisionConfig(
            hidden_size=1280, num_hidden_layers=32, num_attention_heads=16,
            intermediate_size=5120, image_size=1024, patch_size=16,
            output_channels=256, window_size=14,
            global_attn_indexes=(7, 15, 23, 31),
        )
    else:  # vit_b
        vision = sam_lib.SamVisionConfig(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, image_size=1024, patch_size=16,
            output_channels=256, window_size=14,
            global_attn_indexes=(2, 5, 8, 11),
        )
    return sam_lib.SamConfig(
        vision=vision, prompt_hidden_size=256, image_embedding_size=64,
        decoder_hidden_size=256, decoder_num_heads=8, decoder_mlp_dim=2048,
        decoder_layers=2,
    )


def init_sam_hq(cfg: sam_lib.SamConfig, dtype=jnp.bfloat16):
    """Random SAM-HQ params at released scale via the HF module + our
    converter (the same path released weights take)."""
    import torch
    from transformers import SamHQConfig, SamHQModel

    torch.manual_seed(0)
    v = cfg.vision
    hf_cfg = SamHQConfig(
        vision_config=dict(
            hidden_size=v.hidden_size, num_hidden_layers=v.num_hidden_layers,
            num_attention_heads=v.num_attention_heads, image_size=v.image_size,
            patch_size=v.patch_size, intermediate_size=v.intermediate_size,
            output_channels=v.output_channels,
            global_attn_indexes=list(v.global_attn_indexes),
            window_size=v.window_size,
            num_pos_feats=16 if SAM_SIZE == "tiny" else 128,
            attn_implementation="eager",
        ),
        prompt_encoder_config=dict(
            hidden_size=cfg.prompt_hidden_size,
            image_embedding_size=cfg.image_embedding_size,
            image_size=v.image_size, patch_size=v.patch_size,
            mask_input_channels=4 if SAM_SIZE == "tiny" else 16,
        ),
        mask_decoder_config=dict(
            hidden_size=cfg.decoder_hidden_size,
            num_attention_heads=cfg.decoder_num_heads,
            mlp_dim=cfg.decoder_mlp_dim, num_hidden_layers=cfg.decoder_layers,
            iou_head_depth=2 if SAM_SIZE == "tiny" else 3,
            iou_head_hidden_dim=cfg.decoder_hidden_size,
            vit_dim=v.hidden_size,
        ),
        attn_implementation="eager",
    )
    with torch.device("meta"):
        model = SamHQModel(hf_cfg)
    # materialize cheaply: empty tensors (values are irrelevant for a
    # throughput bench; trunc-normal init of 600M params costs minutes)
    sd = {
        k: torch.empty(t.shape, dtype=torch.float32).normal_(0, 0.02)
        for k, t in model.state_dict().items()
    }
    return sam_lib.convert_sam_hq(sd, cfg, dtype=dtype)


def synth_photo(rng, h=IMG_H, w=IMG_W) -> np.ndarray:
    """Deterministic photo-like uint8 image: sky/ground gradient + boxes."""
    img = np.zeros((h, w, 3), np.float32)
    img[:, :, 2] = np.linspace(220, 80, h)[:, None]  # sky gradient
    img[h // 2 :, :, :] = [90, 75, 60]  # ground
    oy, ox = max(h // 8, 8), max(w // 8, 8)  # object scale (tiny-safe)
    for _ in range(6):  # scattered objects
        y = int(rng.integers(h // 3, max(h - oy, h // 3 + 1)))
        x = int(rng.integers(0, max(w - ox, 1)))
        bh, bw = int(rng.integers(oy // 2, oy)), int(rng.integers(ox // 2, ox))
        img[y : y + bh, x : x + bw] = rng.uniform(40, 255, 3)
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    t0 = time.time()
    if TINY:
        import __graft_entry__ as graft

        cfg = graft._tiny_cfg()
        params = vlm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        da_cfg = da.DepthAnythingConfig(
            image_size=42, patch_size=14, hidden_size=48, num_hidden_layers=4,
            num_attention_heads=2, intermediate_size=96,
            out_indices=(1, 2, 3, 4), neck_hidden_sizes=(8, 12, 16, 20),
            reassemble_factors=(4, 2, 1, 0.5), fusion_hidden_size=16,
            head_hidden_size=8,
        )
    else:
        cfg = preset(MODEL)
        cfg = cfg.replace(
            mask_token_id=cfg.llm.vocab_size,
            depth_token_id=cfg.llm.vocab_size + 1,
            num_extra_tokens=8,
        )
        params = bench.fast_init_quantized(cfg, w8a8=True)
        da_cfg = da.DepthAnythingConfig()  # ViT-L
    device_sync(params["llm"]["final_ln"])
    da_params = jax.jit(
        lambda k: da.init_params(k, da_cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    device_sync(jax.tree_util.tree_leaves(da_params)[0])

    scfg = sam_config(SAM_SIZE)
    sam_params = jax.device_put(init_sam_hq(scfg))
    device_sync(jax.tree_util.tree_leaves(sam_params)[0])
    init_s = time.time() - t0

    images = [synth_photo(rng) for _ in range(BATCH)]
    # two box prompts per image (the demo's user boxes)
    boxes = np.stack(
        [
            np.array(
                [
                    [w * 0.1, h * 0.55, w * 0.45, h * 0.95],
                    [w * 0.55, h * 0.5, w * 0.9, h * 0.9],
                ],
                np.float32,
            )
            for (h, w) in [(IMG_H, IMG_W)] * BATCH
        ]
    )

    # ---- stage A: Depth-Anything ----
    predictor = da.DepthPredictor(da_params, da_cfg)

    def stage_depth():
        return predictor.predict_colorized(images)

    colorized = stage_depth()  # compile/warm
    depth_s = time_fn(stage_depth, iters=3, warmup=0)

    # ---- stage B: SAM-HQ masks ----
    sam_in = np.stack(
        [
            pp.pil_bicubic_resize(im, scfg.vision.image_size, scfg.vision.image_size)
            for im in images
        ]
    ).astype(np.float32)
    # ImageNet-normalize + box rescale to the SAM input resolution
    sam_in = (sam_in / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    scale = np.array(
        [
            scfg.vision.image_size / IMG_W,
            scfg.vision.image_size / IMG_H,
        ] * 2,
        np.float32,
    )
    sam_boxes = boxes * scale

    sam_fwd = jax.jit(
        lambda p, px, bx: sam_lib.predict_boxes_hq(p, scfg, px, bx)
    )

    # r5: the global-attention layers run the Pallas grid-bias flash
    # kernel (no (b, 16, 4096, 4096) f32 score tensor), so vit_h batches
    # multiple images per call beside the resident 8B VLM; the remaining
    # transient peak is the windowed layers' (b*256, 16, 196, 196) f32
    # scores (~0.63 GB/image), which bounds the sub-batch
    sam_chunk = (
        min(BATCH, int(os.environ.get("SRGPT_DEMO_SAM_CHUNK", 4)))
        if SAM_SIZE == "vit_h"
        else BATCH
    )
    sam_px = jnp.asarray(sam_in, jnp.bfloat16)
    sam_bx = jnp.asarray(sam_boxes)

    def stage_sam():
        outs = []
        for i in range(0, BATCH, sam_chunk):
            m, iou = sam_fwd(
                sam_params, sam_px[i : i + sam_chunk], sam_bx[i : i + sam_chunk]
            )
            outs.append(np.asarray(m))
        return np.concatenate(outs, axis=0)

    mask_logits = stage_sam()  # (B*2, 256, 256) logits; compile/warm
    sam_s = time_fn(stage_sam, iters=3, warmup=0)
    bin_masks = (mask_logits > 0).astype(np.uint8).reshape(BATCH, 2, *mask_logits.shape[-2:])

    # ---- stage C: VLM region QA ----
    proc = pp.SiglipProcessor(size=cfg.vision.image_size)

    from PIL import Image

    def host_preprocess():
        px, dx, mx, mv = [], [], [], []
        for i in range(BATCH):
            px.append(pp.process_image(Image.fromarray(images[i]), proc))
            dx.append(pp.process_depth(Image.fromarray(colorized[i]), proc))
            m = pp.process_masks(list(bin_masks[i]), proc)
            slots, valid = pp.pad_masks_to_slots(m, 2, proc.size)
            mx.append(slots)
            mv.append(valid)
        return (
            np.stack(px), np.stack(dx), np.stack(mx), np.stack(mv)
        )

    pre0 = time.time()
    px, dx, mx, mv = host_preprocess()
    preprocess_s = time.time() - pre0

    hi = min(1000, cfg.mask_token_id - 1)
    tpi = 4 if TINY else NUM_TOKENS_PER_IMAGE
    rows = []
    for b in range(BATCH):
        ids = (
            [1]
            + list(rng.integers(10, hi, 8))
            + [IMAGE_TOKEN_INDEX]
            + [cfg.mask_token_id, cfg.depth_token_id] * 2
            + list(rng.integers(10, hi, 24 if TINY else 96))
        )
        rows.append(np.asarray(ids, np.int64))
    sb = expand_rows(
        rows, None, max_len=cfg.model_max_length,
        tokens_per_image=tpi,
        mask_token_id=cfg.mask_token_id, depth_token_id=cfg.depth_token_id,
        regions_per_image=2, pad_to=64 if TINY else 320,
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
        images=jnp.asarray(px, jnp.bfloat16),
        depths=jnp.asarray(dx, jnp.bfloat16),
        masks=jnp.asarray(mx, jnp.bfloat16),
        mask_valid=jnp.asarray(mv),
    )
    plens = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)

    def stage_vlm():
        r = generate(
            params, cfg, inputs, plens, max_new_tokens=MAX_NEW,
            temperature=0.0, eos_token_id=-1, attn_impl="onepass",
            kv_quant=True,
        )
        device_sync(r.tokens)
        return r

    stage_vlm()  # compile/warm
    vlm_s = time_fn(stage_vlm, iters=3, warmup=0)

    # ---- end-to-end (warm): depth -> sam -> host preprocess -> generate ----
    def full_pipeline():
        col = stage_depth()
        m = stage_sam()
        host_preprocess()
        stage_vlm()

    e2e_s = time_fn(full_pipeline, iters=3, warmup=1)

    stats = dev.memory_stats() or {}
    peak_hbm_gb = stats.get("peak_bytes_in_use", 0) / 1e9

    print(
        json.dumps(
            {
                "metric": (
                    f"demo-graph images/sec (SAM-HQ {SAM_SIZE} + "
                    f"DA {'tiny' if TINY else 'ViT-L'} + "
                    f"{'tiny-vlm' if TINY else MODEL}, batch {BATCH})"
                ),
                "value": round(BATCH / e2e_s, 3),
                "unit": "images/s",
                "e2e_s": round(e2e_s, 3),
                "depth_s": round(depth_s, 3),
                "sam_s": round(sam_s, 3),
                "host_preprocess_s": round(preprocess_s, 3),
                "vlm_s": round(vlm_s, 3),
                "tokens_per_image": MAX_NEW,
                "peak_hbm_gb": round(peak_hbm_gb, 2),
                "init_s": round(init_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
