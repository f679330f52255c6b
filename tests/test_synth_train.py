"""Training recipes for the synth-pipeline estimators
(synth/train_calibration.py): the virtual-camera warp data path must
produce geometrically consistent labels, and both optimization loops must
fit their objectives on synthetic data.

Reference counterpart: the pretrained PerspectiveFields / WildCamera /
Metric3Dv2 wrappers (dataset_pipeline/osdsynth/processor/pointcloud.py:
20-100) — the reference ships no training code; these recipes are what
replaces its torch-hub downloads."""

import numpy as np
import pytest

from spatialrgpt_tpu.synth import calibration as calib
from spatialrgpt_tpu.synth import train_calibration as tc


def _scene_image(size=96, seed=0):
    """Synthetic upright scene with strong perspective cues: bright sky
    over dark ground (horizon) + vertical stripes (roll cue)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size, 3), np.float32)
    img[: size // 2] = [200, 220, 255]  # sky
    img[size // 2 :] = [60, 50, 40]  # ground
    for x in range(0, size, 12):  # vertical posts
        img[:, x : x + 3] = [rng.uniform(100, 255)] * 3
    return img


def test_warp_identity_is_center_crop_like():
    """roll=pitch=0 with dst vfov == src vfov reproduces the source
    image (resampled)."""
    img = _scene_image(64)
    out = tc.warp_virtual_camera(img, 0.0, 0.0, 60.0, 60.0, 64)
    assert np.allclose(out, img, atol=2.0)


def test_warp_roll_rotates_vertical_features():
    """A 90-degree roll maps the horizontal horizon edge to a vertical
    edge: column variance and row variance swap dominance."""
    img = _scene_image(64)
    out = tc.warp_virtual_camera(img, 90.0, 0.0, 60.0, 60.0, 64)
    # source: horizon = strong variation along rows (y); after 90 roll the
    # variation is along columns (x)
    src_row_var = np.var(img.mean(axis=(1, 2)))
    out_row_var = np.var(out.mean(axis=(1, 2)))
    out_col_var = np.var(out.mean(axis=(0, 2)))
    assert src_row_var > 1000  # the cue exists
    assert out_col_var > out_row_var


def test_warp_zoom_matches_vfov_ratio():
    """Narrower dst vfov zooms in: the horizon band (one row thick at
    src) covers proportionally more rows."""
    img = np.zeros((128, 128, 3), np.float32)
    img[60:68] = 255.0
    wide = tc.warp_virtual_camera(img, 0.0, 0.0, 60.0, 55.0, 128)
    tight = tc.warp_virtual_camera(img, 0.0, 0.0, 60.0, 25.0, 128)
    assert (tight.mean(axis=(1, 2)) > 100).sum() > 1.5 * (
        wide.mean(axis=(1, 2)) > 100
    ).sum()


@pytest.mark.slow
def test_camera_net_fits_warp_labels():
    """A tiny CameraNet trained on the warp data path learns the labels:
    loss drops and held-out roll/pitch MAE beats the
    predict-the-mean baseline."""
    cfg = calib.CameraNetConfig(
        image_size=48, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
    )
    images = [_scene_image(96, seed=s) for s in range(4)]
    params, hist = tc.train_camera_net(
        images, cfg, steps=120, batch_size=16, lr=1e-3, warmup=10, seed=0,
    )
    assert hist[-1] < 0.5 * hist[0], hist

    import jax
    import jax.numpy as jnp

    px, tg = next(tc.warp_batches(images, cfg, 32, seed=99))
    pred = np.asarray(jax.jit(lambda p, x: calib.forward(p, x, cfg))(params, jnp.asarray(px)))
    mae = np.abs(pred[:, :2] - tg[:, :2]).mean()
    baseline = np.abs(tg[:, :2] - tg[:, :2].mean(axis=0)).mean()
    assert mae < baseline, (mae, baseline)


def test_canonicalize_depth_roundtrips_serving_wrapper():
    """canonicalize_depth is the exact inverse of the serving wrapper's
    de-canonicalization (synth/models.py::make_metric_depth_model)."""
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 20.0, (37, 53)).astype(np.float32)
    fx, model_size, cf = 480.0, 64, 1000.0
    canon = tc.canonicalize_depth(depth, fx, model_size, cf)
    scale = model_size / max(depth.shape)
    back = canon * (fx * scale) / cf
    np.testing.assert_allclose(back, depth, rtol=1e-6)


@pytest.mark.slow
def test_metric_depth_head_fits_silog():
    """The SiLog fine-tune loop drives a tiny Depth-Anything metric net
    toward synthetic canonical-depth targets."""
    from spatialrgpt_tpu.models.depth_anything import DepthAnythingConfig

    cfg = DepthAnythingConfig(
        image_size=42, patch_size=14, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=96,
        out_indices=(1, 2, 3, 4), neck_hidden_sizes=(8, 12, 16, 20),
        reassemble_factors=(4, 2, 1, 0.5), fusion_hidden_size=16,
        head_hidden_size=8, metric=True, max_depth=20.0,
    )
    rng = np.random.default_rng(1)

    def batches():
        while True:
            px = rng.standard_normal((2, 42, 42, 3)).astype(np.float32)
            # target correlated with the input so there is signal to fit
            tg = 5.0 + 2.0 * np.abs(px.mean(axis=3))
            yield px, tg.astype(np.float32), np.ones_like(tg, np.float32)

    _, hist = tc.train_metric_depth(
        batches(), cfg, steps=60, batch_size=2, lr=3e-4, warmup=5,
    )
    assert hist[-1] < 0.7 * hist[0], hist


def test_save_load_roundtrip(tmp_path):
    cfg = calib.CameraNetConfig(
        image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
    )
    import jax

    params = calib.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "cam.npz")
    tc.save_params(params, path)
    loaded = tc.load_params(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
