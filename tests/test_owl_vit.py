"""OWL-ViT detector parity vs HF OwlViTForObjectDetection + wrapper behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.models.owl_vit import (
    OwlViTConfig,
    OwlViTTextConfig,
    OwlViTVisionConfig,
    convert_owlvit,
    detect,
    init_params,
    make_detector,
)

TINY = OwlViTConfig(
    vision=OwlViTVisionConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=64,
        patch_size=16,
    ),
    text=OwlViTTextConfig(
        vocab_size=64,
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=8,
    ),
    projection_dim=16,
)


@pytest.fixture(scope="module")
def hf_owl():
    import torch
    from transformers import OwlViTConfig as HFCfg
    from transformers import OwlViTForObjectDetection

    torch.manual_seed(0)
    cfg = HFCfg(
        text_config=dict(
            vocab_size=64,
            hidden_size=16,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=32,
            max_position_embeddings=8,
            attn_implementation="eager",
        ),
        vision_config=dict(
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            image_size=64,
            patch_size=16,
            attn_implementation="eager",
        ),
        projection_dim=16,
    )
    return OwlViTForObjectDetection(cfg).eval()


def _queries(rng, nq=3, T=8):
    # valid CLIP-style queries: BOS-ish low id, content, EOT = highest id
    ids = rng.integers(2, 60, (nq, T)).astype(np.int64)
    ids[:, -1] = 63  # EOT (argmax pooling position)
    mask = np.ones((nq, T), np.int64)
    return ids, mask


@pytest.mark.slow
def test_owlvit_detection_parity(hf_owl):
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    ids, mask = _queries(rng)

    # HF takes (batch * num_queries, T): same queries tiled per image
    with torch.no_grad():
        ref = hf_owl(
            input_ids=torch.from_numpy(np.tile(ids, (2, 1))),
            pixel_values=torch.from_numpy(x),
            attention_mask=torch.from_numpy(np.tile(mask, (2, 1))),
        )
    ref_logits = ref.logits.numpy()  # (B, P, Q)
    ref_boxes = ref.pred_boxes.numpy()  # (B, P, 4)

    params = convert_owlvit(hf_owl.state_dict(), TINY)
    logits, boxes = detect(
        params, TINY, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(boxes), ref_boxes, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_make_detector_contract(hf_owl):
    """detector(image, classes) -> [(label, xyxy within image, score>th)]."""
    params = convert_owlvit(hf_owl.state_dict(), TINY)
    rng = np.random.default_rng(1)

    def tokenize(prompts):
        ids = np.full((len(prompts), 8), 2, np.int64)
        for i, p in enumerate(prompts):
            for j, ch in enumerate(p.encode()[:6]):
                ids[i, 1 + j] = 2 + ch % 58
        ids[:, -1] = 63
        return ids, np.ones_like(ids)

    det = make_detector(params, TINY, tokenize, box_threshold=0.0, max_queries=8)
    img = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    out = det(img, ["cat", "dog"])
    assert len(out) > 0  # threshold 0 keeps every patch
    for label, xyxy, score in out:
        assert label in ("cat", "dog")
        assert 0.0 <= score <= 1.0
        x0, y0, x1, y1 = xyxy
        assert 0 <= x0 <= x1 <= 80 and 0 <= y0 <= y1 <= 48

    assert det(img, []) == []
    # high threshold filters everything
    det_hi = make_detector(params, TINY, tokenize, box_threshold=1.0, max_queries=8)
    assert det_hi(img, ["cat"]) == []


@pytest.mark.slow
def test_owlvit_init_structure(hf_owl):
    params = init_params(jax.random.PRNGKey(0), TINY)
    conv = convert_owlvit(hf_owl.state_dict(), TINY)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(conv)
