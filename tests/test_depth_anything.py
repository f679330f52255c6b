"""Depth-Anything JAX port parity vs HF DepthAnythingForDepthEstimation."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.models.depth_anything import (
    DepthAnythingConfig,
    colorize_depth,
    convert_depth_anything,
    forward_depth,
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
