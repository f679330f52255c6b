"""SAM JAX port parity vs HF SamModel (random weights, tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.models.sam import (

    SamConfig,
    SamVisionConfig,
    convert_sam,
    decode_masks,
    embed_boxes,
    encode_image,
    image_positional_embedding,
    no_mask_dense_embedding,
    predict_boxes,
)

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

TINY = SamConfig(
    vision=SamVisionConfig(
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=64,
        patch_size=16,
        output_channels=32,
        window_size=2,
        global_attn_indexes=(1, 3),
    ),
    prompt_hidden_size=32,
    image_embedding_size=4,
    decoder_hidden_size=32,
    decoder_num_heads=2,
    decoder_mlp_dim=64,
    decoder_layers=2,
)


@pytest.fixture(scope="module")
def hf_sam():
    import torch
    from transformers import SamConfig as HFCfg
    from transformers import SamModel

    torch.manual_seed(0)
    cfg = HFCfg(
        vision_config=dict(
            hidden_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            image_size=64,
            patch_size=16,
            intermediate_size=128,
            output_channels=32,
            global_attn_indexes=[1, 3],
            window_size=2,
            num_pos_feats=16,  # Fourier dim -> decoder hidden 32
            attn_implementation="eager",
        ),
        prompt_encoder_config=dict(
            hidden_size=32, image_embedding_size=4, image_size=64, patch_size=16, mask_input_channels=4
        ),
        mask_decoder_config=dict(
            hidden_size=32,
            num_attention_heads=2,
            mlp_dim=64,
            num_hidden_layers=2,
            iou_head_depth=2,
            iou_head_hidden_dim=32,
        ),
        attn_implementation="eager",
    )
    return SamModel(cfg).eval()


def test_image_encoder_parity(hf_sam):
    import torch

    params = convert_sam(hf_sam.state_dict(), TINY)
    pix = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = hf_sam.vision_encoder(torch.from_numpy(pix.transpose(0, 3, 1, 2)))[0].numpy()
    got = np.asarray(encode_image(params["vision"], jnp.asarray(pix), TINY.vision))
    # HF returns (B, C, H, W)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected, atol=2e-4, rtol=2e-3)


def test_full_box_prediction_parity(hf_sam):
    import torch

    params = convert_sam(hf_sam.state_dict(), TINY)
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[[8.0, 8.0, 40.0, 48.0], [4.0, 16.0, 30.0, 30.0]]], np.float32)

    with torch.no_grad():
        out = hf_sam(
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            input_boxes=torch.from_numpy(boxes),
            multimask_output=False,
        )
    expected_masks = out.pred_masks.numpy()  # (1, n_boxes, 1, 4g, 4g)
    expected_iou = out.iou_scores.numpy()

    masks, iou = predict_boxes(params, TINY, jnp.asarray(pix), jnp.asarray(boxes))
    got_masks = np.asarray(masks).reshape(1, 2, *masks.shape[-2:])
    np.testing.assert_allclose(got_masks, expected_masks[:, :, 0], atol=5e-3, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(iou).reshape(1, 2), expected_iou[:, :, 0], atol=1e-3, rtol=1e-2)


@pytest.fixture(scope="module")
def hf_sam_hq():
    import torch
    from transformers import SamHQConfig, SamHQModel

    torch.manual_seed(0)
    cfg = SamHQConfig(
        vision_config=dict(
            hidden_size=64, num_hidden_layers=4, num_attention_heads=4, image_size=64,
            patch_size=16, intermediate_size=128, output_channels=32,
            global_attn_indexes=[1, 3], window_size=2, num_pos_feats=16,
            attn_implementation="eager",
        ),
        prompt_encoder_config=dict(
            hidden_size=32, image_embedding_size=4, image_size=64, patch_size=16,
            mask_input_channels=4,
        ),
        mask_decoder_config=dict(
            hidden_size=32, num_attention_heads=2, mlp_dim=64, num_hidden_layers=2,
            iou_head_depth=2, iou_head_hidden_dim=32, vit_dim=64,
        ),
        attn_implementation="eager",
    )
    return SamHQModel(cfg).eval()


@pytest.mark.parametrize("hq_token_only", [False, True])
def test_sam_hq_box_prediction_parity(hf_sam_hq, hq_token_only):
    """HQ head: refined mask (SAM + HQ residual, or HQ-only) matches HF
    SamHQModel for box prompts."""
    import torch

    from spatialrgpt_tpu.models.sam import convert_sam_hq, predict_boxes_hq

    params = convert_sam_hq(hf_sam_hq.state_dict(), TINY)
    rng = np.random.default_rng(3)
    pix = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[[8.0, 8.0, 40.0, 48.0], [4.0, 16.0, 30.0, 30.0]]], np.float32)

    with torch.no_grad():
        out = hf_sam_hq(
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            input_boxes=torch.from_numpy(boxes),
            multimask_output=False,
            hq_token_only=hq_token_only,
        )
    expected = out.pred_masks.numpy()  # (1, n_boxes, 1, 4g, 4g)
    expected_iou = out.iou_scores.numpy()

    masks, iou = predict_boxes_hq(
        params, TINY, jnp.asarray(pix), jnp.asarray(boxes), hq_token_only=hq_token_only
    )
    got = np.asarray(masks).reshape(1, 2, *masks.shape[-2:])
    np.testing.assert_allclose(got, expected[:, :, 0], atol=5e-3, rtol=5e-2)
    np.testing.assert_allclose(
        np.asarray(iou).reshape(1, 2), expected_iou[:, :, 0], atol=1e-3, rtol=1e-2
    )


def test_grid_bias_flash_matches_xla_attention(monkeypatch):
    """The Pallas grid-bias kernel (global-layer attention, r5) must match
    the XLA einsum path: same scores = qk*scale + rel_h + rel_w, online
    softmax vs single-shot."""
    import jax

    from spatialrgpt_tpu.models.sam import SamVisionConfig, _vision_attention

    rng = np.random.default_rng(0)
    H = W = 8
    nh, d = 4, 16
    C = nh * d
    cfg = SamVisionConfig(hidden_size=C, num_attention_heads=nh)
    x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
    p = {
        "qkv": {"kernel": jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32),
                 "bias": jnp.zeros((3 * C,), jnp.float32)},
        "proj": {"kernel": jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32),
                  "bias": jnp.zeros((C,), jnp.float32)},
        "rel_pos_h": jnp.asarray(rng.standard_normal((2 * H - 1, d)) * 0.1, jnp.float32),
        "rel_pos_w": jnp.asarray(rng.standard_normal((2 * W - 1, d)) * 0.1, jnp.float32),
    }
    monkeypatch.setenv("SRGPT_SAM_FLASH_MIN", str(10**9))
    ref = _vision_attention(x, p, cfg)
    monkeypatch.setenv("SRGPT_SAM_FLASH_MIN", "0")
    out = _vision_attention(x, p, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_grid_bias_flash_multiblock(monkeypatch):
    """Multi-block schedule (nq = nk = 4) exercises the online-softmax
    accumulation and the per-block rel_h slice indexing."""
    from spatialrgpt_tpu.ops.flash_attention import grid_bias_attention

    rng = np.random.default_rng(1)
    H = W = 16  # S = 256, block = 4 rows * 16 = 64 -> 4x4 blocks
    nh, d = 2, 32
    S = H * W
    q = jnp.asarray(rng.standard_normal((1, nh, S, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, nh, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, nh, S, d)), jnp.float32)
    rel_h = jnp.asarray(rng.standard_normal((1, nh, S, H)) * 0.3, jnp.float32)
    rel_w = jnp.asarray(rng.standard_normal((1, nh, S, W)) * 0.3, jnp.float32)

    out = grid_bias_attention(q, k, v, rel_h, rel_w, grid_w=W, block_q=64, block_k=64)

    # oracle: dense scores + softmax
    scores = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * (d**-0.5)
    kh = np.arange(S) // W
    kw = np.arange(S) % W
    bias = np.asarray(rel_h)[:, :, :, kh] + np.asarray(rel_w)[:, :, :, kw]
    scores = scores + bias
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
