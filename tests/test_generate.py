"""Generate loop: compiled prefill+decode must match naive full-recompute
greedy decoding, including right-padded batches."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.config import (
    LlamaConfig,
    ProjectorConfig,
    RegionExtractorConfig,
    SiglipVisionConfig,
    SpatialRGPTConfig,
)
from spatialrgpt_tpu.constants import IMAGE_TOKEN_INDEX
from spatialrgpt_tpu.data.splice import expand_rows
from spatialrgpt_tpu.models import llama, vlm
from spatialrgpt_tpu.serving.generate import generate
import pytest

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

TINY = SpatialRGPTConfig(
    llm=LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        eos_token_id=63,
    ),
    vision=SiglipVisionConfig(
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=56,
        patch_size=14,
    ),
    projector=ProjectorConfig(mm_hidden_size=16, hidden_size=32),
    region=RegionExtractorConfig(mm_hidden_size=16, hidden_size=32, ada_pool_size=4),
    mask_token_id=60,
    depth_token_id=61,
)


def _inputs_for(prompts, n_images, pad_to=None):
    sb = expand_rows(
        prompts,
        None,
        max_len=64,
        tokens_per_image=4,
        mask_token_id=60,
        depth_token_id=61,
        regions_per_image=2,
        pad_to=pad_to,
    )
    rng = np.random.default_rng(0)
    size = TINY.vision.image_size
    return sb, vlm.VLMInputs(
        input_ids=jnp.asarray(sb.input_ids),
        is_image=jnp.asarray(sb.is_image),
        image_gather_idx=jnp.asarray(sb.image_gather_idx),
        position_ids=jnp.asarray(sb.position_ids),
        segment_ids=jnp.asarray(sb.segment_ids),
        labels=None,
        mask_slot=jnp.asarray(sb.mask_slot),
        is_mask=jnp.asarray(sb.is_mask),
        depth_slot=jnp.asarray(sb.depth_slot),
        is_depth=jnp.asarray(sb.is_depth),
        images=jnp.asarray(rng.standard_normal((n_images, size, size, 3)), jnp.float32),
        depths=jnp.asarray(rng.standard_normal((n_images, size, size, 3)), jnp.float32),
        masks=jnp.asarray((rng.random((n_images, 2, size, size)) > 0.5), jnp.float32),
        mask_valid=jnp.ones((n_images, 2), bool),
    )


def _naive_greedy(params, inputs, row, prompt_len, max_new):
    """Full-recompute greedy decode for one row (oracle)."""
    embeds = vlm.prepare_embeds(params, TINY, inputs)
    emb = embeds[row : row + 1, :prompt_len]
    toks = []
    for _ in range(max_new):
        S = emb.shape[1]
        pos = jnp.arange(S, dtype=jnp.int32)[None]
        h, _ = llama.forward(params["llm"], TINY.llm, inputs_embeds=emb, position_ids=pos)
        lg = llama.logits(params["llm"], h, TINY.llm)
        tok = int(jnp.argmax(lg[0, -1]))
        toks.append(tok)
        if tok == TINY.llm.eos_token_id:
            break
        emb = jnp.concatenate(
            [emb, llama.embed_tokens(params["llm"], jnp.asarray([[tok]]))], axis=1
        )
    return toks


def test_generate_matches_naive_greedy_batched_padded():
    p1 = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8], np.int64)  # expands to 8
    p2 = np.array([IMAGE_TOKEN_INDEX, 7], np.int64)  # expands to 5
    sb, inputs = _inputs_for([p1, p2], n_images=2, pad_to=10)
    params = vlm.init_params(jax.random.PRNGKey(7), TINY)

    prompt_lengths = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)
    assert list(np.asarray(prompt_lengths)) == [8, 5]

    result = generate(
        params, TINY, inputs, prompt_lengths, max_new_tokens=6, temperature=0.0
    )
    toks = np.asarray(result.tokens)

    for row in range(2):
        oracle = _naive_greedy(params, inputs, row, int(prompt_lengths[row]), 6)
        got = list(toks[row][: len(oracle)])
        assert got == oracle, f"row {row}: {got} vs {oracle}"


def test_kv_quant_generate_matches_bf16():
    """int8 KV cache decode: same greedy tokens as the exact cache on a
    tiny model (params fp32 so logit gaps dominate the ~0.4% quant noise)."""
    p1 = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8], np.int64)
    p2 = np.array([IMAGE_TOKEN_INDEX, 7], np.int64)
    sb, inputs = _inputs_for([p1, p2], n_images=2, pad_to=10)
    params = vlm.init_params(jax.random.PRNGKey(7), TINY)
    plens = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)

    exact = generate(params, TINY, inputs, plens, max_new_tokens=8, temperature=0.0, eos_token_id=-1)
    quant = generate(
        params, TINY, inputs, plens, max_new_tokens=8, temperature=0.0,
        eos_token_id=-1, kv_quant=True,
    )
    mismatch = int((np.asarray(exact.tokens) != np.asarray(quant.tokens)).sum())
    assert mismatch == 0, (np.asarray(exact.tokens), np.asarray(quant.tokens))


def test_pallas_decode_kernel_matches_xla():
    """Fused int8 flash-decode kernel (interpret mode on CPU) == the XLA
    fold-scale reference, including GQA head grouping and masked rows.
    The kernel consumes the FLAT token-major cache (B, C, Hk*D) — the
    layout with no XLA normalization conflicts (see decode_attention.py)."""
    from spatialrgpt_tpu.ops.decode_attention import decode_attention_int8_flat
    from spatialrgpt_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(5)
    B, C, Hq, Hk, D = 3, 16, 4, 2, 8
    n_rep = Hq // Hk
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, C, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, C, D)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    # flat token-major: (B, C, Hk*D) / (B, C, Hk)
    kq_f = jnp.swapaxes(kq, 1, 2).reshape(B, C, Hk * D)
    vq_f = jnp.swapaxes(vq, 1, 2).reshape(B, C, Hk * D)
    ks_f = jnp.swapaxes(ks, 1, 2)
    vs_f = jnp.swapaxes(vs, 1, 2)
    lengths = jnp.asarray(rng.integers(0, C, B), jnp.int32)  # pos <= len live

    got = decode_attention_int8_flat(
        q, kq_f, ks_f, vq_f, vs_f, lengths, n_heads=Hk, interpret=True
    )

    # reference: dequantize fully, exact softmax per query head
    valid = jnp.arange(C)[None, :] <= lengths[:, None]
    kf = kq.astype(jnp.float32) * ks[..., None]
    vf = vq.astype(jnp.float32) * vs[..., None]
    kf = jnp.repeat(kf, n_rep, axis=1)
    vf = jnp.repeat(vf, n_rep, axis=1)
    s = jnp.einsum("bhd,bhkd->bhk", q, kf) * (D**-0.5)
    s = jnp.where(valid[:, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhk,bhkd->bhd", p, vf)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # cache-length grid blocking with online-softmax carry must agree
    # with the single-block kernel to rounding
    for bc in (8, C // 2):
        blk = decode_attention_int8_flat(
            q, kq_f, ks_f, vq_f, vs_f, lengths, n_heads=Hk,
            interpret=True, block_c=bc,
        )
        np.testing.assert_allclose(
            np.asarray(blk), np.asarray(got), atol=2e-6, rtol=1e-5
        )


def test_kv_quant_attention_numerics():
    """Quantized cached attention ~= exact attention on random K/V."""
    from spatialrgpt_tpu.ops.quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(3)
    B, C, Hk, D = 2, 16, 2, 8
    k = jnp.asarray(rng.standard_normal((B, C, Hk, D)), jnp.float32)
    kq, ks = quantize_kv(k)
    back = dequantize_kv(kq, ks, jnp.float32)
    err = float(jnp.max(jnp.abs(back - k)))
    scale = float(jnp.max(jnp.abs(k)))
    assert err <= scale / 127.0 + 1e-6


def test_stop_token_ids():
    """Extra stop ids end a row's generation like EOS."""
    params = vlm.init_params(jax.random.PRNGKey(7), TINY)
    p1 = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8], np.int64)
    sb, inputs = _inputs_for([p1], n_images=1, pad_to=10)
    plens = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)

    base = generate(params, TINY, inputs, plens, max_new_tokens=6, temperature=0.0, eos_token_id=-1)
    toks = list(np.asarray(base.tokens)[0])
    # pick a stop id that first appears mid-sequence
    stop_id = next(t for t in toks if t != toks[0])
    first = toks.index(stop_id)
    stopped = generate(
        params, TINY, inputs, plens, max_new_tokens=6, temperature=0.0,
        eos_token_id=-1, stop_token_ids=(int(stop_id),),
    )
    got = list(np.asarray(stopped.tokens)[0])
    # identical up to and including the stop token; padding (-1) after
    assert got[: first + 1] == toks[: first + 1]
    assert all(t == -1 for t in got[first + 1 :])


def test_w8a8_generate_matches_bf16():
    """W8A8 quantized serving (int8 weights x dynamic int8 activations on
    llm + vision, int8 KV): same greedy tokens as the exact model on the
    tiny config — the accuracy gate for the bench's default serving mode."""
    from spatialrgpt_tpu.ops.quant import quantize_llm

    p1 = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8], np.int64)
    p2 = np.array([IMAGE_TOKEN_INDEX, 7], np.int64)
    sb, inputs = _inputs_for([p1, p2], n_images=2, pad_to=10)
    params = vlm.init_params(jax.random.PRNGKey(7), TINY)
    plens = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)

    exact = generate(params, TINY, inputs, plens, max_new_tokens=8, temperature=0.0, eos_token_id=-1)
    qparams = dict(params)
    qparams["llm"] = quantize_llm(params["llm"], bits=8, act_quant=True)
    qparams["vision"] = quantize_llm(params["vision"], bits=8, act_quant=True)
    quant = generate(
        qparams, TINY, inputs, plens, max_new_tokens=8, temperature=0.0,
        eos_token_id=-1, kv_quant=True,
    )
    mismatch = int((np.asarray(exact.tokens) != np.asarray(quant.tokens)).sum())
    assert mismatch == 0, (np.asarray(exact.tokens), np.asarray(quant.tokens))


def test_fused_serving_kernels_match_unfused():
    """fuse_serving_kernels (wqkv / gate|up concat) must not change the
    generated tokens — bf16 tree and the W8A8 int8 tree, llm + vision,
    through the full multimodal generate (the bench's default transform)."""
    from spatialrgpt_tpu.ops.quant import fuse_serving_kernels, quantize_llm

    p1 = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8], np.int64)
    p2 = np.array([IMAGE_TOKEN_INDEX, 7], np.int64)
    sb, inputs = _inputs_for([p1, p2], n_images=2, pad_to=10)
    params = vlm.init_params(jax.random.PRNGKey(7), TINY)
    plens = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)

    # bf16: fused vs unfused (concat along dout leaves per-column matmul
    # reductions identical; greedy tokens must match exactly)
    base = generate(params, TINY, inputs, plens, max_new_tokens=8, temperature=0.0, eos_token_id=-1)
    fused = fuse_serving_kernels(params)
    assert "wqkv" in fused["llm"]["layers"][0]["attn"]
    assert "gu" in fused["llm"]["layers"][0]["mlp"]
    assert "wqkv" in fused["vision"]["layers"][0]["attn"]
    got = generate(fused, TINY, inputs, plens, max_new_tokens=8, temperature=0.0, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(base.tokens), np.asarray(got.tokens))

    # int8 W8A8 + int8 KV: fused vs unfused quantized tree
    qparams = dict(params)
    qparams["llm"] = quantize_llm(params["llm"], bits=8, act_quant=True)
    qparams["vision"] = quantize_llm(params["vision"], bits=8, act_quant=True)
    qbase = generate(
        qparams, TINY, inputs, plens, max_new_tokens=8, temperature=0.0,
        eos_token_id=-1, kv_quant=True,
    )
    qfused = fuse_serving_kernels(qparams)
    kq = qfused["llm"]["layers"][0]["attn"]["wqkv"]["kernel_q"]
    assert "a8" in kq and kq["scale"].shape[0] == 1
    qgot = generate(
        qfused, TINY, inputs, plens, max_new_tokens=8, temperature=0.0,
        eos_token_id=-1, kv_quant=True,
    )
    np.testing.assert_array_equal(np.asarray(qbase.tokens), np.asarray(qgot.tokens))


def test_multi_token_stop_sequences():
    """stop_sequences halts a row right after the sequence appears in its
    output (KeywordsStoppingCriteria for multi-token keywords); unaffected
    rows keep decoding."""
    params = vlm.init_params(jax.random.PRNGKey(0), TINY)
    sb, inputs = _inputs_for(
        [np.asarray([1, 5, IMAGE_TOKEN_INDEX, 60, 61, 7], np.int64),
         np.asarray([1, 9, IMAGE_TOKEN_INDEX, 60, 61, 11], np.int64)],
        n_images=2,
    )
    plens = jnp.asarray(np.asarray(sb.segment_ids).sum(axis=1), jnp.int32)
    base = generate(
        params, TINY, inputs, plens, max_new_tokens=8, temperature=0.0,
        eos_token_id=-1,
    )
    toks = np.asarray(base.tokens)
    # choose the first row's tokens [1:3] as the "keyword" — decoding is
    # deterministic, so the stopped run must cut right after position 2
    seq = tuple(int(x) for x in toks[0, 1:3])
    stopped = generate(
        params, TINY, inputs, plens, max_new_tokens=8, temperature=0.0,
        eos_token_id=-1, stop_sequences=(seq,),
    )
    st = np.asarray(stopped.tokens)
    # row 0: identical up to the keyword, then padded with the (sentinel)
    # eos id — decoding stopped right after the sequence completed
    np.testing.assert_array_equal(st[0, :3], toks[0, :3])
    assert (st[0, 3:] == -1).all()
    # a row whose output never contains the keyword decodes in full
    if tuple(int(x) for x in toks[1].tolist()) .count(seq[0]) == 0:
        np.testing.assert_array_equal(st[1], toks[1])


def test_kv_int4_cache_runs_and_first_token_exact():
    """int4 KV cache (kv_bits=4, opt-in lossy mode): the packed nibble
    roundtrip is exact over the int4 range, generation runs end to end,
    and the first token (sampled from prefill hiddens, before any
    quantized cache read) matches bf16 exactly.  Full greedy parity is
    NOT guaranteed at 4 bits (unlike int8 — see
    test_kv_quant_generate_matches_bf16)."""
    from spatialrgpt_tpu.ops.quant import quantize_kv4, unpack_kv4

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 8)), jnp.float32)
    p, s = quantize_kv4(x)
    assert p.shape == (2, 5, 3, 4)
    u = unpack_kv4(p)
    # dequantized error bounded by the int4 step (absmax/7 per vector)
    err = jnp.abs(u.astype(jnp.float32) * s[..., None] - x)
    assert float(err.max()) <= float(jnp.abs(x).max()) / 7.0 + 1e-6

    params = vlm.init_params(jax.random.PRNGKey(0), TINY)
    sb, inputs = _inputs_for(
        [np.asarray([1, 5, IMAGE_TOKEN_INDEX, 60, 61, 7], np.int64)], n_images=1
    )
    plens = jnp.asarray(np.asarray(sb.segment_ids).sum(axis=1), jnp.int32)
    bf16 = generate(params, TINY, inputs, plens, max_new_tokens=6, temperature=0.0,
                    eos_token_id=-1)
    int4 = generate(params, TINY, inputs, plens, max_new_tokens=6, temperature=0.0,
                    eos_token_id=-1, kv_quant=True, kv_bits=4)
    assert int4.tokens.shape == bf16.tokens.shape
    np.testing.assert_array_equal(
        np.asarray(int4.tokens[:, 0]), np.asarray(bf16.tokens[:, 0])
    )


def test_sampling_top_p_and_temperature():
    """Sampling path: top_p→0 collapses to greedy regardless of
    temperature; at temperature>0 different rng keys can differ but all
    emitted ids stay within the vocab."""
    params = vlm.init_params(jax.random.PRNGKey(0), TINY)
    sb, inputs = _inputs_for(
        [np.asarray([1, 5, IMAGE_TOKEN_INDEX, 60, 61, 7], np.int64)], n_images=1
    )
    plens = jnp.asarray(np.asarray(sb.segment_ids).sum(axis=1), jnp.int32)

    greedy = generate(params, TINY, inputs, plens, max_new_tokens=6,
                      temperature=0.0, eos_token_id=-1)
    # top-p -> tiny keeps only the argmax token: equals greedy for any T
    nucleus = generate(params, TINY, inputs, plens, max_new_tokens=6,
                       temperature=0.7, top_p=1e-6, eos_token_id=-1,
                       rng=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(nucleus.tokens), np.asarray(greedy.tokens))

    a = generate(params, TINY, inputs, plens, max_new_tokens=6, temperature=1.0,
                 eos_token_id=-1, rng=jax.random.PRNGKey(1))
    b = generate(params, TINY, inputs, plens, max_new_tokens=6, temperature=1.0,
                 eos_token_id=-1, rng=jax.random.PRNGKey(2))
    for r in (a, b):
        toks = np.asarray(r.tokens)
        assert ((toks >= -1) & (toks < TINY.llm.vocab_size)).all()
    # same key reproduces exactly
    a2 = generate(params, TINY, inputs, plens, max_new_tokens=6, temperature=1.0,
                  eos_token_id=-1, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(a2.tokens))
