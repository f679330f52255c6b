"""LoRA adapters, CLIP tower parity, and the S2 multi-scale wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.config import LlamaConfig, SiglipVisionConfig
from spatialrgpt_tpu.models import clip, llama, s2
from spatialrgpt_tpu.train.lora import (

    LoraConfig,
    apply_lora,
    init_lora,
    load_adapters,
    merge_lora,
    save_adapters,
)

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

SMALL_LLM = LlamaConfig(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
)


def test_lora_zero_init_is_identity_and_trains():
    params = llama.init_params(jax.random.PRNGKey(0), SMALL_LLM)
    lcfg = LoraConfig(r=4, alpha=8.0)
    adapters = init_lora(jax.random.PRNGKey(1), params, lcfg)
    assert len(adapters) == 2 * 7  # 2 layers x 7 targets

    merged = apply_lora(params, adapters, lcfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (1, 8)), jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    base = llama.forward_logits(params, SMALL_LLM, input_ids=ids, position_ids=pos)
    with_lora = llama.forward_logits(merged, SMALL_LLM, input_ids=ids, position_ids=pos)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-5)

    # gradient flows only through adapters
    def loss(adapters):
        p = apply_lora(params, adapters, lcfg)
        lg = llama.forward_logits(p, SMALL_LLM, input_ids=ids, position_ids=pos)
        return jnp.sum(jnp.square(lg))

    g = jax.grad(loss)(adapters)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gn > 0


def test_lora_save_load_roundtrip(tmp_path):
    params = llama.init_params(jax.random.PRNGKey(0), SMALL_LLM)
    lcfg = LoraConfig(r=2)
    adapters = init_lora(jax.random.PRNGKey(1), params, lcfg)
    p = str(tmp_path / "adapter.npz")
    save_adapters(p, adapters, lcfg)
    back = load_adapters(p)
    for k in adapters:
        np.testing.assert_allclose(np.asarray(adapters[k]["a"]), np.asarray(back[k]["a"]))


def test_clip_tower_parity():
    import torch
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    cfg = SiglipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        select_feature="patch",  # CLIP default drops CLS
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(
        HFCfg(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            image_size=56,
            patch_size=14,
            attn_implementation="eager",
        )
    ).eval()
    params = clip.convert_clip(hf.state_dict(), 3)
    pix = np.random.default_rng(0).standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(pix.transpose(0, 3, 1, 2)), output_hidden_states=True)
    expected = out.hidden_states[-2].numpy()[:, 1:]
    got = np.asarray(clip.forward_features(params, jnp.asarray(pix), cfg))
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=2e-3)


def test_s2_multiscale_shapes_and_crops():
    calls = []

    def fake_tower(x):
        calls.append(x.shape)
        b, h, w, c = x.shape
        t = (h // 14) * (w // 14)
        # feature = mean pixel per patch projected to 8 channels
        patches = x.reshape(b, h // 14, 14, w // 14, 14, c).mean((2, 4))
        feats = jnp.concatenate([patches] * 3, axis=-1)[..., :8]
        return feats.reshape(b, t, 8)

    imgs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 112, 112, 3)), jnp.float32)
    out = s2.multiscale_forward(fake_tower, imgs, scales=(56, 112), base_size=56)
    assert out.shape == (2, 16, 16)  # 4x4 grid, 8 channels x 2 scales
    assert calls[0] == (2, 56, 56, 3)  # scale 1: resized whole image
    assert calls[1] == (8, 56, 56, 3)  # scale 2: 2x2 crops stacked in batch


def test_qlora_apply_on_quantized_base_matches_dequantized():
    """apply_lora on an int8-quantized base == apply_lora on the
    dequantized base (within quant round-trip noise of the base itself)."""
    from spatialrgpt_tpu.ops.quant import dequantize_llm, quantize_llm

    params = llama.init_params(jax.random.PRNGKey(0), SMALL_LLM)
    lcfg = LoraConfig(r=4, alpha=8.0)
    adapters = init_lora(jax.random.PRNGKey(1), params, lcfg)
    # make deltas nonzero
    adapters = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), adapters
    )
    qbase = quantize_llm(params, bits=8)
    # adapter keys are identical for bf16 and quantized bases
    assert set(init_lora(jax.random.PRNGKey(1), qbase, lcfg)) == set(adapters)

    merged_q = apply_lora(qbase, adapters, lcfg)
    merged_ref = apply_lora(dequantize_llm(qbase, jnp.float32), adapters, lcfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(merged_q), jax.tree_util.tree_leaves(merged_ref)
    ):
        if np.asarray(a).dtype == np.float32 and np.asarray(a).ndim == 2:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_qlora_side_branch_matches_merged_forward():
    """apply_lora(merge=False) attaches the adapters and ops/layers.linear
    computes y += (x @ a) @ b * scale — same product as merging, but the
    int8 base kernel is never rewritten (the 8B QLoRA memory contract,
    BASELINE.md r5).  Forward logits must agree with the merged form
    within the merged path's own bf16 kernel-rounding noise."""
    from spatialrgpt_tpu.ops.quant import quantize_llm

    params = llama.init_params(jax.random.PRNGKey(0), SMALL_LLM)
    lcfg = LoraConfig(r=4, alpha=8.0)
    qbase = quantize_llm(params, bits=8)
    adapters = init_lora(jax.random.PRNGKey(1), qbase, lcfg)
    adapters = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jnp.ones_like(x), adapters
    )

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 12)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))

    attached = apply_lora(qbase, adapters, lcfg, merge=False)
    # the base kernels are untouched (still quantized, no bf16 rewrite)
    def kq_leaves(t):
        return [l for p, l in jax.tree_util.tree_leaves_with_path(t)
                if any(getattr(k, "key", None) == "q" for k in p)]
    for a, b in zip(kq_leaves(attached), kq_leaves(qbase)):
        assert a is b
    out_side = llama.forward_logits(attached, SMALL_LLM, input_ids=ids, position_ids=pos)
    merged = apply_lora(qbase, adapters, lcfg, merge=True)
    out_merged = llama.forward_logits(merged, SMALL_LLM, input_ids=ids, position_ids=pos)
    np.testing.assert_allclose(
        np.asarray(out_side, np.float32),
        np.asarray(out_merged, np.float32),
        atol=0.08, rtol=0,
    )
    # and the side branch actually contributes (adapters are nonzero)
    out_base = llama.forward_logits(qbase, SMALL_LLM, input_ids=ids, position_ids=pos)
    assert float(jnp.abs(out_side - out_base).max()) > 0.01


def test_qlora_train_step_trains_adapters_only():
    """make_lora_train_step on an int8 base: loss decreases, adapters and
    projector move, the quantized base is untouched (it is never part of
    the optimizer state at all)."""
    import __graft_entry__ as graft
    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.ops.quant import quantize_llm
    from spatialrgpt_tpu.train.optimizer import OptimizerConfig, build_optimizer
    from spatialrgpt_tpu.train.step import create_train_state, make_lora_train_step

    cfg = graft._tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(r=4, alpha=8.0)
    base = dict(params)
    base["llm"] = quantize_llm(base["llm"], bits=8)
    adapters = init_lora(jax.random.PRNGKey(1), base["llm"], lcfg)
    trainable = {"adapters": adapters, "projector": base.pop("projector")}

    ocfg = OptimizerConfig(learning_rate=5e-3, total_steps=10, warmup_ratio=0.0)
    optimizer = build_optimizer(trainable, ocfg)
    state = create_train_state(trainable, optimizer)
    step_fn = make_lora_train_step(cfg, optimizer, lcfg, donate=False)

    batch = graft._tiny_batch(cfg, B=2, S=64, seed=3)
    losses = []
    for _ in range(6):
        state, metrics = step_fn(state, base, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    moved = jax.tree_util.tree_leaves(state.params["adapters"])
    orig = jax.tree_util.tree_leaves(adapters)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(o)) for a, o in zip(moved, orig)
    )
