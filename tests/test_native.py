"""Native data-ops library vs python references."""

import numpy as np
import pytest

from spatialrgpt_tpu.data.preprocess import rle_decode as py_rle_decode, rle_encode
from spatialrgpt_tpu.utils import native


def test_native_builds():
    assert native.available(), "g++ build of libdataops.so failed"


def test_native_rle_matches_python():
    rng = np.random.default_rng(0)
    mask = (rng.random((41, 57)) > 0.6).astype(np.uint8)
    rle = rle_encode(mask)
    np.testing.assert_array_equal(native.rle_decode(rle), mask)
    np.testing.assert_array_equal(native.rle_decode(rle), py_rle_decode(rle))


def test_native_resize_nearest_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    m = (rng.random((37, 53)) > 0.5).astype(np.uint8)
    ours = native.resize_nearest(m, 96, 96)
    ref = cv2.resize(m, (96, 96), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


def test_native_resize_bilinear_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.standard_normal((24, 36)).astype(np.float32)
    ours = native.resize_bilinear(x, 50, 70)
    ref = F.interpolate(
        torch.from_numpy(x)[None, None], size=(50, 70), mode="bilinear", align_corners=False
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_native_pack_matches_python_fallback():
    rng = np.random.default_rng(3)
    lengths = rng.integers(10, 100, 40)
    bins = native.pack_greedy(lengths, 128)
    # validity: no bin overflows, ids contiguous
    n_bins = bins.max() + 1
    fills = np.zeros(n_bins, np.int64)
    for l, b in zip(lengths, bins):
        fills[b] += l
    assert (fills <= 128).all()
    assert set(bins) == set(range(n_bins))
