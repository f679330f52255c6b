"""Swin backbone parity vs HF SwinModel + RAM-style tagger behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.models.swin import SwinConfig, convert_swin, forward, init_params

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

TINY = SwinConfig(
    image_size=64,
    patch_size=4,
    embed_dim=16,
    depths=(2, 2, 2, 2),
    num_heads=(2, 2, 4, 4),
    window_size=2,
)


@pytest.fixture(scope="module")
def hf_swin():
    import torch
    from transformers import SwinConfig as HFCfg
    from transformers import SwinModel

    torch.manual_seed(0)
    cfg = HFCfg(
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        num_channels=3,
        embed_dim=TINY.embed_dim,
        depths=list(TINY.depths),
        num_heads=list(TINY.num_heads),
        window_size=TINY.window_size,
        mlp_ratio=TINY.mlp_ratio,
        hidden_act="gelu",
        use_absolute_embeddings=False,
        drop_path_rate=0.0,
        attn_implementation="eager",
    )
    model = SwinModel(cfg, add_pooling_layer=False).eval()
    return model


def test_swin_parity(hf_swin):
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, TINY.image_size, TINY.image_size)).astype(np.float32)
    with torch.no_grad():
        ref = hf_swin(torch.from_numpy(x)).last_hidden_state.numpy()

    params = convert_swin(hf_swin.state_dict(), TINY)
    got = np.asarray(forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), TINY))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_ram_tagger_end_to_end():
    """RAM-style tagger: forward shape, thresholding, and the reference's
    tag post-processing semantics (add/remove/bg, substring removal)."""
    from spatialrgpt_tpu.models import ram

    cfg = ram.RamConfig(
        swin=TINY, num_tags=6, hidden_size=16, num_decoder_layers=2, num_heads=2
    )
    params = ram.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    logits = ram.forward(params, x, cfg)
    assert logits.shape == (2, 6)
    assert np.isfinite(np.asarray(logits)).all()

    tags = ["cat", "dog", "sky floor", "car", "tree", "wall"]
    # rig per-class thresholds so the tagger fires deterministically
    probs = 1.0 / (1.0 + np.exp(-np.asarray(ram.forward(params, x[:1], cfg))[0]))
    th = np.where(np.arange(6) % 2 == 0, 0.0, 1.1).astype(np.float32)  # fire evens
    tagger = ram.make_tagger(
        params, cfg, tags, thresholds=th,
        add_classes=["person"], remove_classes=["tree"], bg_classes=["wall", "sky"],
    )
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    out = tagger(img)
    assert "cat" in out and "person" in out
    assert "dog" not in out  # threshold 1.1 never fires
    assert "tree" not in out  # removed
    assert "wall" not in out and "sky floor" not in out  # bg substring removal
    assert out == ["cat", "person"]


def test_process_tag_classes_reference_semantics():
    from spatialrgpt_tpu.models.ram import process_tag_classes

    got = process_tag_classes(
        [" cat ", "", "big Dog", "doghouse"],
        add_classes=["cat", "zebra"],
        remove_classes=["dog"],
    )
    # strip, drop empty, no duplicate add, append zebra, substring-remove dogs
    assert got == ["cat", "zebra"]


def test_swin_init_matches_converted_structure(hf_swin):
    params = init_params(jax.random.PRNGKey(0), TINY)
    conv = convert_swin(hf_swin.state_dict(), TINY)
    s1 = jax.tree_util.tree_structure(params)
    s2 = jax.tree_util.tree_structure(conv)
    assert s1 == s2
