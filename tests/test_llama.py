"""Llama decoder parity vs HF torch LlamaForCausalLM (random weights),
plus packed-segment and KV-cache semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.config import LlamaConfig
from spatialrgpt_tpu.models import llama
from spatialrgpt_tpu.utils.checkpoint import convert_llama

SMALL = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=112,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,  # exercise GQA
    max_position_embeddings=128,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def torch_llama():
    import torch
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFCfg(
        vocab_size=SMALL.vocab_size,
        hidden_size=SMALL.hidden_size,
        intermediate_size=SMALL.intermediate_size,
        num_hidden_layers=SMALL.num_hidden_layers,
        num_attention_heads=SMALL.num_attention_heads,
        num_key_value_heads=SMALL.num_key_value_heads,
        max_position_embeddings=SMALL.max_position_embeddings,
        rope_theta=SMALL.rope_theta,
        rms_norm_eps=SMALL.rms_norm_eps,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    return LlamaForCausalLM(hf_cfg).eval()


def test_logits_parity(torch_llama):
    import torch

    params = convert_llama(torch_llama.state_dict(), SMALL.num_hidden_layers)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, SMALL.vocab_size, (2, 17))
    with torch.no_grad():
        expected = torch_llama(torch.from_numpy(ids)).logits.numpy()

    pos = np.broadcast_to(np.arange(17), (2, 17)).astype(np.int32)
    got = np.asarray(
        llama.forward_logits(
            params,
            SMALL,
            input_ids=jnp.asarray(ids, jnp.int32),
            position_ids=jnp.asarray(pos),
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_packed_segments_match_separate_rows(torch_llama):
    """Two sequences packed into one row with segment ids must produce the
    same logits as the two rows run separately."""
    params = convert_llama(torch_llama.state_dict(), SMALL.num_hidden_layers)
    rng = np.random.default_rng(1)
    a = rng.integers(0, SMALL.vocab_size, (1, 7))
    b = rng.integers(0, SMALL.vocab_size, (1, 5))

    def run(ids):
        s = ids.shape[1]
        pos = np.arange(s)[None].astype(np.int32)
        return np.asarray(
            llama.forward_logits(
                params, SMALL, input_ids=jnp.asarray(ids, jnp.int32), position_ids=jnp.asarray(pos)
            )
        )

    separate = [run(a)[0], run(b)[0]]

    packed_ids = np.concatenate([a, b, np.zeros((1, 4), np.int64)], axis=1)
    seg = np.array([[1] * 7 + [2] * 5 + [0] * 4], np.int32)
    pos = np.array([list(range(7)) + list(range(5)) + [0] * 4], np.int32)
    packed = np.asarray(
        llama.forward_logits(
            params,
            SMALL,
            input_ids=jnp.asarray(packed_ids, jnp.int32),
            position_ids=jnp.asarray(pos),
            segment_ids=jnp.asarray(seg),
        )
    )
    np.testing.assert_allclose(packed[0, :7], separate[0], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(packed[0, 7:12], separate[1], atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_kv_cache_decode_matches_full_forward(torch_llama):
    """Prefill + token-by-token decode must reproduce the full-sequence
    forward logits at every position."""
    params = convert_llama(torch_llama.state_dict(), SMALL.num_hidden_layers)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, SMALL.vocab_size, (1, 12)), jnp.int32)
    pos = jnp.arange(12, dtype=jnp.int32)[None]

    full = llama.forward_logits(params, SMALL, input_ids=ids, position_ids=pos)

    cache = llama.KVCache.init(SMALL, batch=1, capacity=16, dtype=jnp.float32)
    # prefill first 8 tokens
    x = llama.embed_tokens(params, ids[:, :8])
    h, cache = llama.forward(
        params, SMALL, inputs_embeds=x, position_ids=pos[:, :8], cache=cache
    )
    prefill_logits = llama.logits(params, h, SMALL)
    np.testing.assert_allclose(
        np.asarray(prefill_logits), np.asarray(full[:, :8]), atol=1e-4, rtol=1e-3
    )
    # decode remaining 4 one token at a time
    for t in range(8, 12):
        x = llama.embed_tokens(params, ids[:, t : t + 1])
        h, cache = llama.forward(
            params, SMALL, inputs_embeds=x, position_ids=pos[:, t : t + 1], cache=cache
        )
        step_logits = llama.logits(params, h, SMALL)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, t]), atol=1e-4, rtol=1e-3
        )


def test_rope_linear_scaling_changes_frequencies():
    cfg = SMALL
    scaled = LlamaConfig(**{**cfg.__dict__, "rope_scaling_factor": 2.0})
    q = jnp.ones((1, 4, 2, 16))
    k = jnp.ones((1, 4, 1, 16))
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    q1, _ = llama.apply_rope(q, k, pos, cfg)
    q2, _ = llama.apply_rope(q, k, pos * 2, scaled)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
