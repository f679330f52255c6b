"""Decoder family parity vs HF torch models: Mistral (sliding window),
Gemma (norm+1 / gelu / scaled embeds / tied head), Mixtral (dense MoE)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.config import LlamaConfig
from spatialrgpt_tpu.models import llama
from spatialrgpt_tpu.utils.checkpoint import convert_llama


def _run(params, cfg, ids):
    pos = np.broadcast_to(np.arange(ids.shape[1]), ids.shape).astype(np.int32)
    return np.asarray(
        llama.forward_logits(
            params,
            cfg,
            input_ids=jnp.asarray(ids, jnp.int32),
            position_ids=jnp.asarray(pos),
        )
    )


def test_mistral_parity_with_sliding_window():
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        sliding_window=8,  # shorter than the 20-token input
    )
    torch.manual_seed(0)
    hf = MistralForCausalLM(
        MistralConfig(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=64,
            rms_norm_eps=1e-6,
            sliding_window=8,
            attn_implementation="eager",
            tie_word_embeddings=False,
        )
    ).eval()
    params = convert_llama(hf.state_dict(), 2)
    ids = np.random.default_rng(0).integers(0, 128, (1, 20))
    with torch.no_grad():
        expected = hf(torch.from_numpy(ids)).logits.numpy()
    got = _run(params, cfg, ids)
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=2e-3)


@pytest.mark.slow
def test_gemma_parity():
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        hidden_act="gelu_tanh",
        norm_plus_one=True,
        scale_embeddings=True,
        explicit_head_dim=16,
        tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    hf = GemmaForCausalLM(
        GemmaConfig(
            vocab_size=256,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            max_position_embeddings=64,
            rms_norm_eps=1e-6,
            hidden_act="gelu_pytorch_tanh",
            attn_implementation="eager",
        )
    ).eval()
    params = convert_llama(hf.state_dict(), 2)
    ids = np.random.default_rng(1).integers(0, 256, (2, 11))
    with torch.no_grad():
        expected = hf(torch.from_numpy(ids)).logits.numpy()
    got = _run(params, cfg, ids)
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=2e-3)


@pytest.mark.slow
def test_mixtral_parity():
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        num_experts=4,
        num_experts_per_tok=2,
        sliding_window=None,
    )
    torch.manual_seed(2)
    hf = MixtralForCausalLM(
        MixtralConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=64,
            rms_norm_eps=1e-6,
            num_local_experts=4,
            num_experts_per_tok=2,
            sliding_window=None,
            attn_implementation="eager",
            tie_word_embeddings=False,
        )
    ).eval()
    params = convert_llama(hf.state_dict(), 2)
    assert len(params["layers"][0]["experts"]) == 4
    ids = np.random.default_rng(2).integers(0, 128, (1, 9))
    with torch.no_grad():
        expected = hf(torch.from_numpy(ids)).logits.numpy()
    got = _run(params, cfg, ids)
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=3e-3)


@pytest.mark.slow
def test_moe_sparse_matches_dense():
    """Grouped-GEMM sparse MoE (lax.ragged_dot, models/llama.py::
    _moe_block_sparse) must reproduce the dense reference execution:
    same outputs, same router aux loss, and working gradients."""
    from spatialrgpt_tpu.models import llama

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        num_experts=4,
        num_experts_per_tok=2,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    stacked = llama.stack_experts(params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 32)), jnp.float32)

    lp = params["layers"][0]
    sp = stacked["layers"][0]
    out_d, aux_d = llama._moe_block(x, lp, cfg)
    out_s, aux_s = llama._moe_block_sparse(x, sp, cfg)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(aux_s), float(aux_d), rtol=1e-5)

    # per-expert-list params fall back to the dense block
    out_f, _ = llama._moe_block_sparse(x, lp, cfg)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d), atol=0, rtol=0)

    # gradients flow through the ragged grouped GEMMs
    def loss(st):
        o, a = llama._moe_block_sparse(x, st, cfg)
        return jnp.sum(jnp.square(o)) + a

    g = jax.grad(loss)(
        {"experts_stacked": sp["experts_stacked"], "router": sp["router"]}
    )
    assert float(jnp.abs(g["experts_stacked"]["gate"]).sum()) > 0
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0


def test_moe_sparse_full_forward_and_aux_loss():
    """cfg.moe_impl='sparse' through the full decoder + loss: logits match
    the dense impl and loss_fn surfaces router_aux_loss."""
    from spatialrgpt_tpu.models import llama

    base = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        num_experts=4,
        num_experts_per_tok=2,
    )
    params = llama.init_params(jax.random.PRNGKey(1), base)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (2, 9)))
    pos = jnp.broadcast_to(jnp.arange(9), (2, 9))

    dense_logits = llama.forward_logits(
        params, base, input_ids=ids, position_ids=pos
    )
    sp_cfg = dataclasses.replace(base, moe_impl="sparse")
    sparse_logits = llama.forward_logits(
        llama.stack_experts(params), sp_cfg, input_ids=ids, position_ids=pos
    )
    np.testing.assert_allclose(
        np.asarray(sparse_logits), np.asarray(dense_logits), atol=5e-5, rtol=1e-4
    )

    h, _, aux = llama.forward(
        params, base, inputs_embeds=llama.embed_tokens(params, ids, base),
        position_ids=pos, with_aux=True,
    )
    assert float(aux) > 0  # 2 layers of E * sum(f*P) >= 1 each
