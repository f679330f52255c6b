"""Device-side image front-end vs the host oracle (data/preprocess.py).

The host path is bit-exact PIL; the device path must match it exactly
(resize: integer-for-integer; normalize: identical f32 ops) — the gate
VERDICT r3 next-#6 asks for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.data import preprocess as pp
from spatialrgpt_tpu.data.device_preprocess import (
    device_mask_resize_nearest,
    device_preprocess_uint8,
    device_resize_uint8,
    device_siglip_normalize,
)


@pytest.mark.parametrize(
    "src_hw,out",
    [
        ((1024, 1024), 384),  # serving downscale
        ((768, 1024), 128),  # non-square, big ratio
        ((500, 333), 384),  # upscale one axis, downscale other
        ((96, 96), 384),  # pure upscale
        ((384, 384), 384),  # identity
        ((4032, 128), 384),  # phone-photo downscale (~10.5x): beyond the
        # fixed k=12 radix's exact range — exercises the adaptive split
        ((2000, 100), 64),  # ~31x downscale
    ],
)
def test_device_resize_matches_pil_exactly(src_hw, out):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, *src_hw, 3), np.uint8)
    got = np.asarray(
        jax.jit(lambda x: device_resize_uint8(x, out, out))(jnp.asarray(imgs))
    )
    for i in range(len(imgs)):
        exp = pp.pil_bicubic_resize(imgs[i], out, out)
        np.testing.assert_array_equal(got[i], exp)


def test_device_resize_extreme_values():
    """All-0 / all-255 / checkerboard: the fixed-point clamp edges."""
    base = np.zeros((1, 200, 300, 3), np.uint8)
    cases = [base, base + 255]
    cb = base.copy()
    cb[:, ::2, ::2] = 255
    cb[:, 1::2, 1::2] = 255
    cases.append(cb)
    f = jax.jit(lambda x: device_resize_uint8(x, 96, 96))
    for imgs in cases:
        got = np.asarray(f(jnp.asarray(imgs)))
        exp = pp.pil_bicubic_resize(imgs[0], 96, 96)
        np.testing.assert_array_equal(got[0], exp)


def test_device_normalize_matches_processor():
    """uint8 at processor size -> normalized f32: same f32 ops as
    SiglipProcessor; XLA may fuse them into FMAs, so the gate is <= 2 ulp
    (the VERDICT r3 "within 1 ulp post-normalize" criterion — relative
    2.4e-7 is 2 f32 ulps)."""
    rng = np.random.default_rng(1)
    proc = pp.SiglipProcessor(size=64)
    imgs = rng.integers(0, 256, (3, 64, 64, 3), np.uint8)
    got = np.asarray(
        jax.jit(lambda x: device_siglip_normalize(x))(jnp.asarray(imgs))
    )
    for i in range(len(imgs)):
        exp = proc(imgs[i])
        np.testing.assert_allclose(got[i], exp, rtol=3e-7, atol=1.2e-7)


def test_device_full_preprocess_matches_host_path():
    """resize + normalize chained == process_image(resize path) on a
    uint8 source, bit-for-bit through the resize and ulp-exact after."""
    from PIL import Image

    rng = np.random.default_rng(2)
    proc = pp.SiglipProcessor(size=96)
    imgs = rng.integers(0, 256, (2, 200, 150, 3), np.uint8)
    got = np.asarray(
        jax.jit(lambda x: device_preprocess_uint8(x, 96))(jnp.asarray(imgs))
    )
    for i in range(len(imgs)):
        # host oracle: PIL-exact resize + processor normalize (the
        # processor's own resize path routes through the same
        # pil_bicubic_resize for array input); the resize is
        # integer-exact, the trailing normalize is <= 2 ulp (FMA fusion)
        exp = proc(imgs[i])
        np.testing.assert_allclose(got[i], exp, rtol=3e-7, atol=1.2e-7)
        # and the PIL-object route agrees (preprocess.py's documented
        # bit-parity with Image.resize)
        exp_pil = proc(Image.fromarray(imgs[i]).resize((96, 96), Image.BICUBIC))
        np.testing.assert_allclose(got[i], exp_pil, rtol=3e-7, atol=1.2e-7)


def test_device_mask_resize_matches_process_masks():
    rng = np.random.default_rng(3)
    masks = (rng.random((2, 2, 120, 180)) > 0.6).astype(np.uint8)
    proc = pp.SiglipProcessor(size=64)
    got = np.asarray(
        jax.jit(lambda m: device_mask_resize_nearest(m, 64))(jnp.asarray(masks))
    )
    for b in range(2):
        exp = pp.process_masks(list(masks[b]), proc)
        np.testing.assert_array_equal(got[b], exp)


def test_generate_uint8_inputs_match_host_preprocessed():
    """End-to-end: generate() fed raw uint8 pixels (normalized in-graph)
    emits the same greedy tokens as the host-preprocessed path."""
    import __graft_entry__ as graft
    from spatialrgpt_tpu.constants import IMAGE_TOKEN_INDEX
    from spatialrgpt_tpu.data.splice import expand_rows
    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.serving.generate import generate

    cfg = graft._tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    proc = pp.SiglipProcessor(size=size)

    raw_img = rng.integers(0, 256, (1, size, size, 3), np.uint8)
    raw_depth = rng.integers(0, 256, (1, size, size, 3), np.uint8)
    raw_masks = (rng.random((1, 2, size, size)) > 0.5).astype(np.uint8)

    sb = expand_rows(
        [np.asarray([5, IMAGE_TOKEN_INDEX, cfg.mask_token_id, cfg.depth_token_id, 8], np.int64)],
        None, max_len=64, tokens_per_image=4,
        mask_token_id=cfg.mask_token_id, depth_token_id=cfg.depth_token_id,
        regions_per_image=2, pad_to=32,
    )
    common = dict(
        input_ids=jnp.asarray(sb.input_ids), is_image=jnp.asarray(sb.is_image),
        image_gather_idx=jnp.asarray(sb.image_gather_idx),
        position_ids=jnp.asarray(sb.position_ids),
        segment_ids=jnp.asarray(sb.segment_ids), labels=None,
        mask_slot=jnp.asarray(sb.mask_slot), is_mask=jnp.asarray(sb.is_mask),
        depth_slot=jnp.asarray(sb.depth_slot), is_depth=jnp.asarray(sb.is_depth),
        mask_valid=jnp.ones((1, 2), bool),
    )
    host = vlm.VLMInputs(
        images=jnp.asarray(proc(raw_img[0])[None], jnp.bfloat16),
        depths=jnp.asarray(proc(raw_depth[0])[None], jnp.bfloat16),
        masks=jnp.asarray(raw_masks.astype(np.float32), jnp.bfloat16),
        **common,
    )
    dev = vlm.VLMInputs(
        images=jnp.asarray(raw_img), depths=jnp.asarray(raw_depth),
        masks=jnp.asarray(raw_masks), **common,
    )
    plens = jnp.asarray([int(sb.segment_ids.sum())], jnp.int32)
    a = generate(params, cfg, host, plens, max_new_tokens=5, temperature=0.0, eos_token_id=-1)
    b = generate(params, cfg, dev, plens, max_new_tokens=5, temperature=0.0, eos_token_id=-1)
    assert np.asarray(a.tokens).tolist() == np.asarray(b.tokens).tolist()
