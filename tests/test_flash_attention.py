"""Pallas flash attention vs XLA oracle: forward + gradients, causal,
segment-packed, GQA, padding. Runs in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.ops.attention import causal_attention
from spatialrgpt_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, B, S, Hq, Hk, D):
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    return q, k, v


def _xla_full(q, k, v, segment_ids=None, causal=True):
    return causal_attention(q, k, v, segment_ids=segment_ids, impl="xla") if causal else _xla_noncausal(q, k, v)


def _xla_noncausal(q, k, v):
    b, s, hq, d = q.shape
    n_rep = hq // k.shape[2]
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@pytest.mark.parametrize("causal", [True, False])
def test_fwd_matches_xla_plain(causal):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, 2, 128, 4, 4, 32)
    got = flash_attention(q, k, v, causal=causal, block_q=64, block_k=64, interpret=True)
    exp = _xla_full(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5, rtol=2e-4)


def test_fwd_gqa_and_segments():
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, 2, 128, 8, 2, 32)
    seg = np.zeros((2, 128), np.int32)
    seg[0, :50] = 1
    seg[0, 50:100] = 2  # row 0: two packed sequences + padding
    seg[1, :128] = 1  # row 1: full
    seg = jnp.asarray(seg)
    got = flash_attention(q, k, v, segment_ids=seg, causal=True, block_q=64, block_k=64, interpret=True)
    exp = causal_attention(q, k, v, segment_ids=seg, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5, rtol=2e-4)


@pytest.mark.slow
def test_grads_match_xla():
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, 1, 128, 4, 2, 32)
    seg = np.zeros((1, 128), np.int32)
    seg[0, :80] = 1
    seg[0, 80:112] = 2
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg, causal=True, block_q=64, block_k=64, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = causal_attention(q, k, v, segment_ids=seg, impl="xla")
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


def test_fwd_bf16():
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 1, 128, 4, 4, 64)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    got = flash_attention(q, k, v, causal=True, block_q=64, block_k=64, interpret=True)
    exp = causal_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)), np.asarray(exp), atol=3e-2, rtol=3e-2
    )


def test_fwd_block_h_multihead():
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, 2, 128, 8, 8, 32)
    seg = jnp.asarray(np.where(np.arange(128) < 100, 1, 0)[None].repeat(2, 0), jnp.int32)
    got = flash_attention(
        q, k, v, segment_ids=seg, causal=False, block_q=64, block_k=64, block_h=4, interpret=True
    )
    exp = flash_attention(
        q, k, v, segment_ids=seg, causal=False, block_q=64, block_k=64, block_h=1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5)


def test_vit_attention_matches_xla_ragged():
    # ragged S (90 -> padded 128 in-kernel), several block_h shapes
    from spatialrgpt_tpu.ops.vit_attention import vit_attention

    rng = np.random.default_rng(7)
    q, k, v = _rand_qkv(rng, 2, 90, 8, 8, 24)
    exp = _xla_noncausal(q, k, v)
    for bh in (1, 4, 8):
        got = vit_attention(q, k, v, block_h=bh, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), atol=2e-5, rtol=2e-4
        )


def test_vit_attention_bf16_block_h_fallback():
    from spatialrgpt_tpu.ops.vit_attention import vit_attention

    rng = np.random.default_rng(8)
    q, k, v = _rand_qkv(rng, 1, 64, 6, 6, 32)  # H=6: block_h 8 -> falls to 2
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    got = vit_attention(q, k, v, block_h=8, interpret=True)
    exp = _xla_noncausal(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)), np.asarray(exp), atol=3e-2, rtol=3e-2
    )


def test_vit_attention_grads_match_xla():
    from spatialrgpt_tpu.ops.vit_attention import vit_attention

    rng = np.random.default_rng(9)
    q, k, v = _rand_qkv(rng, 1, 70, 4, 4, 16)

    def loss_kernel(q, k, v):
        return jnp.sum(vit_attention(q, k, v, block_h=4, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_noncausal(q, k, v) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4, err_msg=f"d{name}"
        )


# ---------------------------------------------------------------------------
# One-pass causal prefill kernel (ops/prefill_attention.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fold_g", [True, False])
@pytest.mark.parametrize("hq,hk", [(4, 4), (8, 2)])
def test_onepass_prefill_matches_xla(hq, hk, fold_g):
    """One-pass serving-prefill kernel vs the XLA oracle: causal, GQA,
    both the folded-G single-matmul path and the per-head loop."""
    from spatialrgpt_tpu.ops.prefill_attention import onepass_attention

    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, 2, 128, hq, hk, 32)
    got = onepass_attention(q, k, v, interpret=True, fold_g=fold_g)
    exp = causal_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)


def test_onepass_prefill_segments_padding_and_ragged():
    """Packed segments + trailing padding + ragged (non-128-multiple) S;
    padded rows come out exactly zero like the XLA path."""
    from spatialrgpt_tpu.ops.prefill_attention import onepass_attention

    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, 2, 100, 4, 2, 32)
    seg = np.zeros((2, 100), np.int32)
    seg[0, :40] = 1
    seg[0, 40:80] = 2  # packed row: two segments + padding tail
    seg[1, :70] = 1
    seg = jnp.asarray(seg)
    exp = causal_attention(q, k, v, segment_ids=seg, impl="xla")
    for fold_g in (True, False):
        got = onepass_attention(q, k, v, segment_ids=seg, interpret=True, fold_g=fold_g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)
        assert np.all(np.asarray(got)[0, 80:] == 0.0)


def test_onepass_prefill_sliding_window():
    from spatialrgpt_tpu.ops.prefill_attention import onepass_attention

    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, 1, 128, 4, 4, 32)
    got = onepass_attention(q, k, v, window=16, interpret=True)
    exp = causal_attention(q, k, v, impl="xla", window=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)


@pytest.mark.slow
def test_onepass_prefill_gradients_match_xla():
    """The XLA-recompute VJP reproduces the oracle's gradients (packed
    segments + GQA), so the kernel is usable in short-bucket training."""
    from spatialrgpt_tpu.ops.prefill_attention import onepass_attention

    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 2, 128, 4, 2, 16)
    seg = np.zeros((2, 128), np.int32)
    seg[0, :90] = 1
    seg[1, :64] = 1
    seg[1, 64:128] = 2
    seg = jnp.asarray(seg)

    def loss_kernel(q, k, v):
        o = onepass_attention(q, k, v, segment_ids=seg, interpret=True)
        return jnp.sum(o * o)

    def loss_xla(q, k, v):
        o = causal_attention(q, k, v, segment_ids=seg, impl="xla")
        return jnp.sum(o * o)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_onepass_block_q_smaller_than_s():
    """bq < S exercises the q-block grid dimension (the long-bucket path)."""
    from spatialrgpt_tpu.ops.prefill_attention import onepass_attention

    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, 1, 256, 4, 4, 32)
    got = onepass_attention(q, k, v, block_q=128, interpret=True)
    exp = causal_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)
