"""Image/depth/mask preprocessing parity vs HF SiglipImageProcessor and a
pycocotools-free RLE round trip."""

import numpy as np
import pytest
from PIL import Image

from spatialrgpt_tpu.data.preprocess import (
    SiglipProcessor,
    expand2square,
    masks_from_annotations,
    pad_to_square_array,
    process_depth,
    process_image,
    process_masks,
    rle_decode,
    rle_encode,
)


@pytest.fixture(scope="module")
def hf_processor():
    from transformers import SiglipImageProcessor

    return SiglipImageProcessor(
        size={"height": 56, "width": 56},
        image_mean=[0.5, 0.5, 0.5],
        image_std=[0.5, 0.5, 0.5],
    )


def test_processor_matches_hf(hf_processor):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (70, 90, 3), np.uint8))
    ours = SiglipProcessor(size=56)(img)
    theirs = hf_processor.preprocess(img, return_tensors="np")["pixel_values"][0]
    # identical uint8 resample -> only f32 normalize rounding remains
    np.testing.assert_allclose(ours.transpose(2, 0, 1), theirs, atol=1e-6)


def test_processor_numpy_input_matches_hf(hf_processor):
    """uint8 numpy arrays at non-native sizes must match HF bit-for-bit:
    HF routes arrays through PIL bicubic; our numpy path reproduces PIL's
    fixed-point resample exactly (no more cv2 INTER_CUBIC drift)."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, (70, 90, 3), np.uint8)
    ours = SiglipProcessor(size=56)(arr)
    theirs = hf_processor.preprocess(Image.fromarray(arr), return_tensors="np")[
        "pixel_values"
    ][0]
    np.testing.assert_allclose(ours.transpose(2, 0, 1), theirs, atol=1e-6)


def test_pil_bicubic_resize_exact():
    """pil_bicubic_resize == PIL Image.resize(BICUBIC), exact uint8
    equality, across up/down/asymmetric scales and channel counts."""
    from spatialrgpt_tpu.data.preprocess import pil_bicubic_resize

    rng = np.random.default_rng(3)
    cases = [
        ((100, 60), (56, 56)),   # downscale, non-square input
        ((40, 40), (384, 384)),  # upscale
        ((383, 385), (384, 384)),  # near-native odd sizes
        ((720, 1280), (384, 384)),  # photo-like downscale
        ((30, 200), (200, 30)),  # extreme aspect swap
    ]
    for (h, w), (oh, ow) in cases:
        for c in (1, 3):
            arr = rng.integers(0, 256, (h, w, c), np.uint8)
            pil = Image.fromarray(arr[:, :, 0] if c == 1 else arr)
            exp = np.asarray(pil.resize((ow, oh), Image.BICUBIC))
            if c == 1:
                exp = exp[:, :, None]
            got = pil_bicubic_resize(arr, oh, ow)
            assert got.dtype == np.uint8
            np.testing.assert_array_equal(got, exp, err_msg=f"{(h, w, c)}->{(oh, ow)}")


def test_process_image_resize_matches_reference_flow(hf_processor):
    """reference 'resize' flow: PIL resize to crop size, then processor."""
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (100, 60, 3), np.uint8))
    ours = process_image(img, SiglipProcessor(size=56), "resize")
    ref_img = img.convert("RGB").resize((56, 56))
    theirs = hf_processor.preprocess(ref_img, return_tensors="np")["pixel_values"][0]
    np.testing.assert_allclose(ours.transpose(2, 0, 1), theirs, atol=2e-2, rtol=1e-2)
    assert ours.shape == (56, 56, 3)


def test_expand2square():
    img = Image.fromarray(np.full((40, 20, 3), 200, np.uint8))
    sq = expand2square(img, (127, 127, 127))
    assert sq.size == (40, 40)
    arr = np.asarray(sq)
    assert (arr[:, :10] == 127).all() and (arr[:, 30:] == 127).all()
    assert (arr[:, 10:30] == 200).all()


def test_rle_roundtrip():
    rng = np.random.default_rng(2)
    mask = (rng.random((37, 53)) > 0.6).astype(np.uint8)
    rle = rle_encode(mask)
    back = rle_decode(rle)
    np.testing.assert_array_equal(back, mask)


def test_rle_compressed_string():
    """Compressed-counts decode vs a known tiny example: 3x3 with the
    middle column set, column-major runs = [3, 3, 3]."""
    mask = np.zeros((3, 3), np.uint8)
    mask[:, 1] = 1
    rle = {"size": [3, 3], "counts": [3, 3, 3]}
    np.testing.assert_array_equal(rle_decode(rle), mask)


def test_masks_from_bbox_and_process():
    src = {"bbox": [[2, 3, 30, 40], [0, 0, 10, 10]]}
    info = {"height": 50, "width": 60}
    masks = masks_from_annotations(src, image_info=info, modality="bbox")
    assert len(masks) == 2 and masks[0].shape == (50, 60)
    assert masks[0][10, 10] == 1 and masks[0][45, 50] == 0
    out = process_masks(masks, SiglipProcessor(size=56), "resize")
    assert out.shape == (2, 56, 56)
    assert out.max() <= 1.0 and out.min() >= 0.0
    assert out[0].sum() > 0


def test_process_depth_shapes():
    rng = np.random.default_rng(3)
    depth = Image.fromarray(rng.integers(0, 255, (80, 70), np.uint8)).convert("RGB")
    out = process_depth(depth, SiglipProcessor(size=56), "resize")
    assert out.shape == (56, 56, 3)
