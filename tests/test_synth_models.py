"""End-to-end synth pipeline with the real model stack (tiny random
weights): RAM tagger -> OWL-ViT detector -> SAM segmenter -> Depth-
Anything depth -> pointcloud lift -> QA templates.  This is the
osdsynth run_template_qa.py flow with every model slot filled by the
TPU ports (reference wires RAM/GroundingDINO/SAM/Metric3D)."""

import jax
import numpy as np

from spatialrgpt_tpu.models import owl_vit, ram, sam
from spatialrgpt_tpu.models.swin import SwinConfig
from spatialrgpt_tpu.synth.models import build_stage_models, make_sam_segmenter
from spatialrgpt_tpu.synth.pipeline import SynthConfig, SynthPipeline
import pytest

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

RAM_CFG = ram.RamConfig(
    swin=SwinConfig(image_size=64, patch_size=4, embed_dim=16, depths=(1, 1, 1, 1),
                    num_heads=(2, 2, 2, 2), window_size=2),
    num_tags=4, hidden_size=16, num_decoder_layers=1, num_heads=2,
)
OWL_CFG = owl_vit.OwlViTConfig(
    vision=owl_vit.OwlViTVisionConfig(hidden_size=32, num_hidden_layers=1,
                                      num_attention_heads=2, intermediate_size=64,
                                      image_size=64, patch_size=16),
    text=owl_vit.OwlViTTextConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                                  num_attention_heads=2, intermediate_size=32,
                                  max_position_embeddings=8),
    projection_dim=16,
)
SAM_CFG = sam.SamConfig(
    vision=sam.SamVisionConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                               intermediate_size=128, image_size=64, patch_size=16,
                               output_channels=32, window_size=2, global_attn_indexes=(1,)),
    prompt_hidden_size=32, image_embedding_size=4, decoder_hidden_size=32,
    decoder_num_heads=2, decoder_mlp_dim=64, decoder_layers=2, iou_head_depth=2,
    iou_head_hidden=32,
)


def _sam_params():
    import torch
    from transformers import SamConfig as HFCfg
    from transformers import SamModel

    torch.manual_seed(0)
    cfg = HFCfg(
        vision_config=dict(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=2, image_size=64,
            patch_size=16, intermediate_size=128, output_channels=32,
            global_attn_indexes=[1], window_size=2, num_pos_feats=16,
            attn_implementation="eager",
        ),
        prompt_encoder_config=dict(
            hidden_size=32, image_embedding_size=4, image_size=64, patch_size=16,
            mask_input_channels=4,
        ),
        mask_decoder_config=dict(
            hidden_size=32, num_attention_heads=2, mlp_dim=64, num_hidden_layers=2,
            iou_head_depth=2, iou_head_hidden_dim=32,
        ),
        attn_implementation="eager",
    )
    return sam.convert_sam(SamModel(cfg).eval().state_dict(), SAM_CFG)


def _tokenize(prompts):
    ids = np.full((len(prompts), 8), 2, np.int64)
    for i, p in enumerate(prompts):
        for j, ch in enumerate(p.encode()[:6]):
            ids[i, 1 + j] = 2 + ch % 58
    ids[:, -1] = 63
    return ids, np.ones_like(ids)


def test_full_model_stack_through_pipeline():
    rng = np.random.default_rng(0)
    models = build_stage_models(
        ram_params=ram.init_params(jax.random.PRNGKey(0), RAM_CFG),
        ram_cfg=RAM_CFG,
        ram_tags=["chair", "table", "lamp", "rug"],
        owl_params=owl_vit.init_params(jax.random.PRNGKey(1), OWL_CFG),
        owl_cfg=OWL_CFG,
        owl_tokenize=_tokenize,
        sam_params=_sam_params(),
        sam_cfg=SAM_CFG,
        box_threshold=0.0,  # random weights: keep every patch proposal
        thresholds=np.zeros(4, np.float32),  # tagger: every tag fires
    )
    assert set(models) == {"tagger", "detector", "segmenter"}

    cfg = SynthConfig(
        min_detections=1, max_detections=6, mask_area_min=0.0, mask_area_max=1.0,
        nms_iou=1.01, containment_iou=1.01, dbscan_min_points=2, n_pairs=2, n_conv=2,
    )
    pipe = SynthPipeline(cfg, **models)

    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    depth = (rng.random((48, 64)) * 3 + 0.5).astype(np.float32)

    result = pipe.annotate(img, depth=depth)
    assert len(result["objects"]) >= 1
    for obj in result["objects"]:
        assert obj["caption"] in ("chair", "table", "lamp", "rug")
        x0, y0, x1, y1 = obj["box"]
        assert 0 <= x0 <= x1 <= 64 and 0 <= y0 <= y1 <= 48
    if len(result["objects"]) >= 2:
        assert len(result["qa"]) > 0
        for qa in result["qa"]:
            assert qa["question"] and qa["answer"]


def test_sam_segmenter_resizes_masks_to_image():
    params = _sam_params()
    seg = make_sam_segmenter(params, SAM_CFG)
    rng = np.random.default_rng(1)
    img = (rng.random((30, 50, 3)) * 255).astype(np.uint8)
    masks = seg(img, [np.array([5, 5, 40, 25], np.float32), np.array([0, 0, 20, 20], np.float32)])
    assert len(masks) == 2
    for m in masks:
        assert m.shape == (30, 50) and m.dtype == bool
    assert seg(img, []) == []
