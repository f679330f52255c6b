"""SigLIP tower parity vs HF torch SiglipVisionModel (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.config import SiglipVisionConfig
from spatialrgpt_tpu.models import siglip
from spatialrgpt_tpu.utils.checkpoint import convert_siglip

SMALL = SiglipVisionConfig(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    image_size=56,
    patch_size=14,
)


@pytest.fixture(scope="module")
def torch_tower():
    import torch
    from transformers import SiglipVisionConfig as HFCfg
    from transformers import SiglipVisionModel

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        hidden_size=SMALL.hidden_size,
        intermediate_size=SMALL.intermediate_size,
        num_hidden_layers=SMALL.num_hidden_layers,
        num_attention_heads=SMALL.num_attention_heads,
        image_size=SMALL.image_size,
        patch_size=SMALL.patch_size,
        attn_implementation="eager",
    )
    model = SiglipVisionModel(hf_cfg).eval()
    return model


def test_forward_features_matches_hf(torch_tower):
    import torch

    params = convert_siglip(torch_tower.state_dict(), SMALL.num_hidden_layers)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, SMALL.image_size, SMALL.image_size, 3)).astype(
        np.float32
    )

    with torch.no_grad():
        hf_out = torch_tower(
            torch.from_numpy(pix.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    # reference contract: hidden_states[-2], cls_patch keeps all tokens
    expected = hf_out.hidden_states[-2].numpy()

    got = np.asarray(siglip.forward_features(params, jnp.asarray(pix), SMALL))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


def test_forward_full_matches_hf(torch_tower):
    import torch

    params = convert_siglip(torch_tower.state_dict(), SMALL.num_hidden_layers)
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((1, SMALL.image_size, SMALL.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        hf_out = torch_tower(torch.from_numpy(pix.transpose(0, 3, 1, 2)))
    expected = hf_out.last_hidden_state.numpy()
    got = np.asarray(siglip.forward_full(params, jnp.asarray(pix), SMALL))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=2e-3)


def test_patch_select_drops_first_token():
    cfg = SiglipVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=28,
        patch_size=14,
        select_feature="patch",
    )
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    pix = jnp.zeros((1, 28, 28, 3))
    out = siglip.forward_features(params, pix, cfg)
    assert out.shape == (1, cfg.num_patches - 1, 32)


def test_resolution_elevation_pos_embed_resize():
    import torch

    cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    new_params, new_cfg = siglip.resize_pos_embeds(params, cfg, 56)
    assert new_cfg.image_size == 56
    assert new_params["pos_embed"].shape == (16, 32)

    # reference formula oracle (vision_encoder.py:74-90)
    old = torch.from_numpy(np.asarray(params["pos_embed"]))
    mapped = torch.arange(16) / 15 * (old.shape[0] - 1)
    floor = mapped.floor().long().clamp(0, old.shape[0] - 1)
    ceil = mapped.ceil().long().clamp(0, old.shape[0] - 1)
    expected = (mapped - floor)[:, None] * old[ceil] + (ceil - mapped)[:, None] * old[floor]
    np.testing.assert_allclose(
        np.asarray(new_params["pos_embed"]), expected.numpy(), atol=1e-6
    )
    # tower runs at the elevated resolution
    out = siglip.forward_features(new_params, jnp.zeros((1, 56, 56, 3)), new_cfg)
    assert out.shape == (1, 16, 32)


def test_vit_attention_padded_backward_matches_unpadded():
    """Pad-once differentiation (advisor r4 medium): gradients through the
    padded kernel (valid_len < S) must match the unpadded kernel's on the
    valid slice — tune_vision_tower training runs this path on TPU."""
    import jax

    from spatialrgpt_tpu.ops.vit_attention import vit_attention

    rng = np.random.default_rng(0)
    B, S, H, D = 2, 100, 2, 16
    Sp = 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)

    def pad(t):
        return jnp.pad(t, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))

    def loss_unpadded(q, k, v):
        return jnp.sum(vit_attention(q, k, v, interpret=True) ** 2)

    def loss_padded(q, k, v):
        out = vit_attention(pad(q), pad(k), pad(v), interpret=True, valid_len=S)
        return jnp.sum(out[:, :S] ** 2)

    g0 = jax.grad(loss_unpadded, argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(loss_padded, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
