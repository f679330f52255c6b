"""Golden tests for host-side expansion (data/splice.py) and the device
splice (models/vlm.py)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.config import (
    LlamaConfig,
    ProjectorConfig,
    RegionExtractorConfig,
    SiglipVisionConfig,
    SpatialRGPTConfig,
)
from spatialrgpt_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from spatialrgpt_tpu.data.splice import expand_rows, pack_rows
from spatialrgpt_tpu.models import vlm

TINY = SpatialRGPTConfig(
    llm=LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
    ),
    vision=SiglipVisionConfig(
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=56,
        patch_size=14,  # 4x4 = 16 patches
    ),
    projector=ProjectorConfig(mm_hidden_size=16, hidden_size=32),
    region=RegionExtractorConfig(mm_hidden_size=16, hidden_size=32, ada_pool_size=4),
    mask_token_id=60,
    depth_token_id=61,
    model_max_length=256,
)
TOKENS_PER_IMAGE = 4  # 4x4 grid -> flat_square -> 2x2


def test_expand_rows_golden():
    ids = np.array([5, IMAGE_TOKEN_INDEX, 7, 60, 61, 8], np.int64)
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 7, IGNORE_INDEX, IGNORE_INDEX, 8], np.int64)
    sb = expand_rows(
        [ids],
        [labels],
        max_len=32,
        tokens_per_image=4,
        mask_token_id=60,
        depth_token_id=61,
        regions_per_image=8,
    )
    # 6 tokens, image expands to 4 -> 9 positions
    assert sb.input_ids.shape == (1, 9)
    np.testing.assert_array_equal(sb.is_image[0], [0, 1, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(sb.image_gather_idx[0, 1:5], [0, 1, 2, 3])
    np.testing.assert_array_equal(sb.input_ids[0], [5, 0, 0, 0, 0, 7, 60, 61, 8])
    # labels: image slots IGNORE
    np.testing.assert_array_equal(
        sb.labels[0],
        [IGNORE_INDEX] + [IGNORE_INDEX] * 4 + [7, IGNORE_INDEX, IGNORE_INDEX, 8],
    )
    # region slots: first (only) mask/depth occurrence -> flat region 0 of image 0
    assert sb.is_mask[0, 6] and sb.mask_slot[0, 6] == 0
    assert sb.is_depth[0, 7] and sb.depth_slot[0, 7] == 0
    np.testing.assert_array_equal(sb.position_ids[0], np.arange(9))
    np.testing.assert_array_equal(sb.segment_ids[0], np.ones(9))


def test_expand_rows_second_row_regions_use_second_image():
    row = np.array([IMAGE_TOKEN_INDEX, 60, 60], np.int64)
    sb = expand_rows(
        [row, row],
        None,
        max_len=32,
        tokens_per_image=2,
        mask_token_id=60,
        regions_per_image=4,
    )
    # row 0 masks -> regions 0,1 of image 0 ; row 1 -> regions 0,1 of image 1
    assert sb.mask_slot[0, 2] == 0 and sb.mask_slot[0, 3] == 1
    assert sb.mask_slot[1, 2] == 4 and sb.mask_slot[1, 3] == 5


def test_truncation_after_expansion():
    ids = np.array([1, 2, IMAGE_TOKEN_INDEX, 3], np.int64)
    sb = expand_rows([ids], None, max_len=5, tokens_per_image=4)
    assert sb.input_ids.shape == (1, 5)
    np.testing.assert_array_equal(sb.is_image[0], [0, 0, 1, 1, 1])


def test_pack_rows_segments_and_payload():
    a = expand_rows([np.array([1, 2, 3], np.int64)], None, max_len=16)
    b = expand_rows([np.array([4, 5], np.int64)], None, max_len=16)
    packed = pack_rows([a, b], max_len=8)
    assert packed.input_ids.shape == (1, 8)
    np.testing.assert_array_equal(packed.input_ids[0, :5], [1, 2, 3, 4, 5])
    np.testing.assert_array_equal(packed.segment_ids[0], [1, 1, 1, 2, 2, 0, 0, 0])
    np.testing.assert_array_equal(packed.position_ids[0, :5], [0, 1, 2, 0, 1])


def _make_inputs(sb, n_images=1, n_regions=2):
    rng = np.random.default_rng(0)
    size = TINY.vision.image_size
    return vlm.VLMInputs(
        input_ids=jnp.asarray(sb.input_ids),
        is_image=jnp.asarray(sb.is_image),
        image_gather_idx=jnp.asarray(sb.image_gather_idx),
        position_ids=jnp.asarray(sb.position_ids),
        segment_ids=jnp.asarray(sb.segment_ids),
        labels=jnp.asarray(sb.labels),
        mask_slot=jnp.asarray(sb.mask_slot),
        is_mask=jnp.asarray(sb.is_mask),
        depth_slot=jnp.asarray(sb.depth_slot),
        is_depth=jnp.asarray(sb.is_depth),
        images=jnp.asarray(rng.standard_normal((n_images, size, size, 3)), jnp.float32),
        depths=jnp.asarray(rng.standard_normal((n_images, size, size, 3)), jnp.float32),
        masks=jnp.asarray(
            (rng.random((n_images, n_regions, size, size)) > 0.5), jnp.float32
        ),
        mask_valid=jnp.ones((n_images, n_regions), bool),
    )


@pytest.mark.slow
def test_vlm_splice_places_embeds_correctly():
    ids = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8], np.int64)
    sb = expand_rows(
        [ids],
        None,
        max_len=64,
        tokens_per_image=TOKENS_PER_IMAGE,
        mask_token_id=60,
        depth_token_id=61,
        regions_per_image=2,
    )
    inputs = _make_inputs(sb)
    params = vlm.init_params(jax.random.PRNGKey(0), TINY)

    image_features, mask_embeds, depth_embeds = vlm.encode_images(
        params, TINY, inputs.images, inputs.depths, inputs.masks
    )
    assert image_features.shape == (1, TOKENS_PER_IMAGE, 32)
    assert mask_embeds.shape == (1, 2, 32)

    embeds = vlm.splice_embeds(params, TINY, inputs, image_features, mask_embeds, depth_embeds)
    # position 0: text token 5
    np.testing.assert_allclose(
        np.asarray(embeds[0, 0]), np.asarray(params["llm"]["embed_tokens"][5]), atol=1e-6
    )
    # positions 1-4: image tokens
    np.testing.assert_allclose(
        np.asarray(embeds[0, 1:5]), np.asarray(image_features[0]), atol=1e-6
    )
    # position 5: <mask> -> region 0 rgb embed; position 6: <depth> -> region 0 depth
    np.testing.assert_allclose(
        np.asarray(embeds[0, 5]), np.asarray(mask_embeds[0, 0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(embeds[0, 6]), np.asarray(depth_embeds[0, 0]), atol=1e-6
    )


def test_vlm_loss_runs_and_is_finite():
    ids = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8, 9, 10], np.int64)
    labels = np.where(np.isin(ids, [8, 9, 10]), ids, IGNORE_INDEX)
    sb = expand_rows(
        [ids],
        [labels],
        max_len=64,
        tokens_per_image=TOKENS_PER_IMAGE,
        mask_token_id=60,
        depth_token_id=61,
        regions_per_image=2,
    )
    inputs = _make_inputs(sb)
    params = vlm.init_params(jax.random.PRNGKey(1), TINY)
    loss, metrics = vlm.loss_fn(params, TINY, inputs)
    assert np.isfinite(float(loss))
    assert int(metrics["num_tokens"]) == 3


def test_expand_rows_text_only_row_mixed_with_image_rows():
    """No-image rows coexist with image rows (reference llava_arch.py
    num_images == 0 branch)."""
    img_row = np.array([5, IMAGE_TOKEN_INDEX, 7], np.int64)
    text_row = np.array([11, 12, 13, 14], np.int64)
    sb = expand_rows([img_row, text_row], None, max_len=16, tokens_per_image=3)
    assert sb.is_image[0].sum() == 3
    assert sb.is_image[1].sum() == 0
    np.testing.assert_array_equal(sb.input_ids[1, :4], [11, 12, 13, 14])
    assert sb.segment_ids[1, :4].tolist() == [1, 1, 1, 1]


def test_expand_rows_multiple_images_one_row():
    row = np.array([IMAGE_TOKEN_INDEX, 5, IMAGE_TOKEN_INDEX], np.int64)
    sb = expand_rows([row], None, max_len=16, tokens_per_image=2)
    # two images -> gather indices 0..1 then 2..3
    idx = sb.image_gather_idx[0][sb.is_image[0]]
    np.testing.assert_array_equal(idx, [0, 1, 2, 3])


@pytest.mark.slow
def test_chunked_ce_matches_unchunked_loss_and_grads():
    """ce_chunk computes the identical loss (same lse math, chunk-local
    reductions) and identical projector gradients as the unchunked path —
    it only changes what materializes (no (B, S, V) logits)."""
    ids = np.array([5, IMAGE_TOKEN_INDEX, 60, 61, 8, 9, 10, 11, 12], np.int64)
    labels = np.where(np.isin(ids, [8, 9, 10, 11, 12]), ids, IGNORE_INDEX)
    sb = expand_rows(
        [ids], [labels], max_len=16, tokens_per_image=TOKENS_PER_IMAGE,
        mask_token_id=60, depth_token_id=61, regions_per_image=2,
    )
    inputs = _make_inputs(sb)
    assert inputs.labels.shape[1] % 4 == 0, inputs.labels.shape
    params = vlm.init_params(jax.random.PRNGKey(2), TINY)

    l_ref, m_ref = vlm.loss_fn(params, TINY, inputs)
    l_chk, m_chk = vlm.loss_fn(params, TINY, inputs, ce_chunk=4)
    np.testing.assert_allclose(float(l_ref), float(l_chk), rtol=1e-6)
    assert int(m_ref["num_tokens"]) == int(m_chk["num_tokens"])

    g_ref = jax.grad(lambda p: vlm.loss_fn(p, TINY, inputs)[0])(params)
    g_chk = jax.grad(lambda p: vlm.loss_fn(p, TINY, inputs, ce_chunk=4)[0])(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref["projector"]),
        jax.tree_util.tree_leaves(g_chk["projector"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
