"""End-to-end data path: DummyDataset -> Collator -> VLMInputs -> loss."""

import jax
import numpy as np

from spatialrgpt_tpu.config import (
    LlamaConfig,
    ProjectorConfig,
    RegionExtractorConfig,
    SiglipVisionConfig,
    SpatialRGPTConfig,
)
from spatialrgpt_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from spatialrgpt_tpu.data.dataset import (
    Collator,
    CollatorConfig,
    DummyDataset,
    to_vlm_inputs,
)
from spatialrgpt_tpu.models import vlm

from test_templates import FakeTokenizer
import pytest

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

TINY = SpatialRGPTConfig(
    llm=LlamaConfig(
        vocab_size=1024,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=1024,
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
    mask_token_id=1009,  # FakeTokenizer vocab id for <mask>
    depth_token_id=1010,
)


class SpatialFakeTokenizer(FakeTokenizer):
    """mask/depth specials resolve to the TINY config's token ids."""


def _collate(samples, pack):
    coll = Collator(
        CollatorConfig(
            max_len=384,
            pack=pack,
            tokens_per_image=4,
            mask_token_id=TINY.mask_token_id,
            depth_token_id=TINY.depth_token_id,
            regions_per_image=2,
            image_size=56,
        )
    )
    return coll(samples)


def test_collator_shapes_and_image_indexing():
    tok = SpatialFakeTokenizer()
    ds = DummyDataset(tok, None, size=4, image_size=56, conv_template="v1")
    samples = [ds[i] for i in range(3)]
    batch, images, depths, masks, valid = _collate(samples, pack=False)
    assert images.shape == (3, 56, 56, 3)
    assert masks.shape == (3, 2, 56, 56)
    # each row's image gather indices point at its own image block
    for row in range(3):
        idx = batch.image_gather_idx[row][batch.is_image[row]]
        assert idx.min() == row * 4 and idx.max() == row * 4 + 3
    # mask slots renumbered per image
    for row in range(3):
        slots = batch.mask_slot[row][batch.is_mask[row]]
        assert (slots == row * 2).all()


def test_collator_packing_preserves_tokens():
    tok = SpatialFakeTokenizer()
    ds = DummyDataset(tok, None, size=4, image_size=56, conv_template="v1")
    samples = [ds[i] for i in range(4)]
    unpacked, *_ = _collate(samples, pack=False)
    packed, *_ = _collate(samples, pack=True)
    # all non-pad tokens preserved (reference packing sanity:
    # new_attention_mask.sum() == attention_mask.sum(), llava_arch.py:876)
    assert (packed.segment_ids != 0).sum() == (unpacked.segment_ids != 0).sum()
    assert packed.is_image.sum() == unpacked.is_image.sum()
    assert set(np.unique(packed.image_gather_idx[packed.is_image])) == set(
        np.unique(unpacked.image_gather_idx[unpacked.is_image])
    )


def test_full_loss_from_dataset():
    tok = SpatialFakeTokenizer()
    ds = DummyDataset(tok, None, size=4, image_size=56, conv_template="v1")
    samples = [ds[i] for i in range(2)]
    batch, images, depths, masks, valid = _collate(samples, pack=True)
    inputs = to_vlm_inputs(batch, images, depths, masks, valid)
    params = vlm.init_params(jax.random.PRNGKey(0), TINY)
    loss, metrics = vlm.loss_fn(params, TINY, inputs)
    assert np.isfinite(float(loss))
    assert int(metrics["num_tokens"]) > 0


def test_collator_pad_batch_to_fixed_rows():
    tok = SpatialFakeTokenizer()
    ds = DummyDataset(tok, None, size=2, image_size=56, conv_template="v1")
    coll = Collator(
        CollatorConfig(
            max_len=384, pack=False, tokens_per_image=4,
            mask_token_id=TINY.mask_token_id, depth_token_id=TINY.depth_token_id,
            regions_per_image=2, image_size=56, pad_batch_to=4,
        )
    )
    batch, *_ = coll([ds[0], ds[1]])
    assert batch.input_ids.shape[0] == 4
    assert (batch.segment_ids[2:] == 0).all()  # pad rows fully masked


def test_prefetcher_preserves_order_and_errors():
    """data/prefetch.py: background prefetch yields the same sequence,
    terminates cleanly, and surfaces producer exceptions."""
    from spatialrgpt_tpu.data.prefetch import Prefetcher

    out = list(Prefetcher(iter(range(17)), depth=3))
    assert out == list(range(17))

    # transfer hook applies on the background thread
    out = list(Prefetcher(range(5), depth=2, transfer=lambda x: x * 10))
    assert out == [0, 10, 20, 30, 40]

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer failed")

    it = Prefetcher(boom(), depth=2)
    assert next(it) == 1 and next(it) == 2
    try:
        next(it)
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "producer failed" in str(e)

    # close() unblocks a full queue
    p = Prefetcher(range(1000), depth=1)
    assert next(p) == 0
    p.close()
