"""Decoder family parity vs HF torch models: Mistral (sliding window),
Gemma (norm+1 / gelu / scaled embeds / tied head), Mixtral (dense MoE)."""

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
