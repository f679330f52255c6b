"""Depth-Anything JAX port parity vs HF DepthAnythingForDepthEstimation."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.models.depth_anything import (
    DepthAnythingConfig,
    colorize_depth,
    convert_depth_anything,
    forward_depth,
    init_params,
    resize_align_corners,
)

TINY = DepthAnythingConfig(
    hidden_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=256,
    patch_size=14,
    out_indices=(1, 2, 3, 4),
    neck_hidden_sizes=(16, 24, 32, 40),
    reassemble_factors=(4, 2, 1, 0.5),
    fusion_hidden_size=32,
    head_hidden_size=16,
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import DepthAnythingConfig as HFCfg
    from transformers import DepthAnythingForDepthEstimation

    torch.manual_seed(0)
    cfg = HFCfg(
        backbone_config=dict(
            model_type="dinov2",
            hidden_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            mlp_ratio=4,
            patch_size=14,
            image_size=56,
            out_indices=[1, 2, 3, 4],
            apply_layernorm=True,
            reshape_hidden_states=False,
        ),
        reassemble_hidden_size=64,
        fusion_hidden_size=32,
        patch_size=14,
        neck_hidden_sizes=[16, 24, 32, 40],
        head_in_index=-1,
        head_hidden_size=16,
        reassemble_factors=[4, 2, 1, 0.5],
    )
    return DepthAnythingForDepthEstimation(cfg).eval()


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).standard_normal((1, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(resize_align_corners(jnp.asarray(x), (11, 13)))
    theirs = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(11, 13), mode="bilinear", align_corners=True
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_depth_forward_parity(hf_model):
    import torch

    params = convert_depth_anything(hf_model.state_dict(), TINY)
    pix = np.random.default_rng(1).standard_normal((1, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        expected = hf_model(torch.from_numpy(pix.transpose(0, 3, 1, 2))).predicted_depth.numpy()
    got = np.asarray(forward_depth(params, jnp.asarray(pix), TINY))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-2)


def test_colorize_depth():
    d = jnp.asarray(np.linspace(0, 5, 16).reshape(1, 4, 4))
    c = np.asarray(colorize_depth(d))
    assert c.shape == (1, 4, 4, 3)
    assert c.min() == 0 and c.max() == 255
    assert (c[..., 0] == c[..., 1]).all()


def test_resize_lower_bound_matches_reference_transform():
    """resize_lower_bound_hw == depth_anything.util.transform.Resize with
    width=height=518, keep_aspect_ratio, lower_bound, multiple_of=14 —
    the exact transform the reference bench builds (eval_spatial.py:41-52)."""
    from spatialrgpt_tpu.models.depth_anything import resize_lower_bound_hw

    def ref_constrain(x, multiple=14, min_val=518):
        y = int(np.round(x / multiple) * multiple)
        if y < min_val:
            y = int(np.ceil(x / multiple) * multiple)
        return y

    def ref_get_size(h, w, target=518):
        scale_height = target / h
        scale_width = target / w
        # lower_bound: scale up to the LARGER ratio so both dims >= target
        if scale_width > scale_height:
            scale_height = scale_width
        else:
            scale_width = scale_height
        return (
            ref_constrain(scale_height * h),
            ref_constrain(scale_width * w),
        )

    rng = np.random.default_rng(0)
    for _ in range(200):
        h = int(rng.integers(50, 2000))
        w = int(rng.integers(50, 2000))
        assert resize_lower_bound_hw(h, w) == ref_get_size(h, w), (h, w)
    assert resize_lower_bound_hw(518, 518) == (518, 518)


@pytest.mark.slow
def test_depth_predictor_matches_reference_colorize_flow():
    """DepthPredictor output == the reference get_depth_map flow
    (eval_spatial.py:92-106) run step by step on the same JAX forward:
    transform -> forward -> bilinear back to original -> min-max uint8 x3.
    Also checks memoization by key and same-shape batching."""
    import cv2
    import jax

    from spatialrgpt_tpu.models.depth_anything import (
        DepthPredictor,
        _IMAGENET_MEAN,
        _IMAGENET_STD,
        resize_lower_bound_hw,
    )

    params = init_params(jax.random.PRNGKey(3), TINY)
    target = TINY.patch_size * 3  # tiny stand-in for 518
    pred = DepthPredictor(params, TINY, target=target)

    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, (50, 70, 3), np.uint8)

    # reference flow, step by step
    img = raw.astype(np.float32) / 255.0
    oh, ow = resize_lower_bound_hw(50, 70, target, TINY.patch_size)
    img = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_CUBIC)
    img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
    d = forward_depth(params, jnp.asarray(img[None]), TINY)[0]
    d = jax.image.resize(d, (50, 70), method="bilinear")
    d = np.asarray(d, np.float32)
    u8 = ((d - d.min()) / max(d.max() - d.min(), 1e-8) * 255.0).astype(np.uint8)
    expected = np.stack([u8, u8, u8], axis=-1)

    got = pred.predict_colorized([raw], keys=["a"])[0]
    np.testing.assert_array_equal(got, expected)
    assert got.shape == (50, 70, 3) and got.dtype == np.uint8

    # memoized: second call returns the cached array without recompute
    again = pred.predict_colorized([np.zeros_like(raw)], keys=["a"])[0]
    np.testing.assert_array_equal(again, expected)

    # mixed batch: two same-shaped + one different-shaped image
    raw2 = rng.integers(0, 256, (50, 70, 3), np.uint8)
    raw3 = rng.integers(0, 256, (40, 90, 3), np.uint8)
    outs = pred.predict_colorized([raw2, raw3, raw])
    assert outs[0].shape == (50, 70, 3)
    assert outs[1].shape == (40, 90, 3)
    np.testing.assert_array_equal(outs[2], expected)
