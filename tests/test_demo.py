"""Demo engine: region rewriting, SoM overlay, chat flow with fakes."""

import numpy as np

from spatialrgpt_tpu.demo.engine import (
    DemoEngine,
    DemoState,
    draw_som_overlay,
    remap_region_indices,
    rewrite_region_prompt,
)


def test_rewrite_region_prompt():
    text, idx = rewrite_region_prompt("Is <region0> left of <region2>?")
    assert text == "Is <mask> <depth> left of <mask> <depth>?"
    assert idx == [0, 2]
    text, idx = rewrite_region_prompt("<region1>?", enable_depth=False)
    assert text == "<mask>?" and idx == [1]


def test_remap_region_indices():
    # model saw regions [0, 2] as prompt-order [0], [1]
    assert remap_region_indices("Region [1] is left of [0].", [0, 2]) == "Region [2] is left of [0]."
    assert remap_region_indices("[5] unknown", [0]) == "[5] unknown"


def test_som_overlay():
    img = np.zeros((20, 20, 3), np.uint8)
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 1
    out = draw_som_overlay(img, [m])
    assert out.shape == (20, 20, 3)
    assert out[10, 10].sum() > 0  # tinted
    assert out[0, 0].sum() == 0  # untouched


def test_chat_flow_with_fakes():
    calls = {}

    def segment(image, boxes):
        calls["boxes"] = boxes
        m = np.zeros(image.shape[:2], np.uint8)
        for x1, y1, x2, y2 in boxes:
            m[int(y1) : int(y2), int(x1) : int(x2)] = 1
        return [m]

    def depth(image):
        return np.linspace(0, 1, image.size // 3).reshape(image.shape[:2])

    def generate(prompt, image, depth_c, masks):
        calls["prompt"] = prompt
        calls["n_masks"] = len(masks)
        return "Region [0] is 2.0 meters wide."

    engine = DemoEngine(segment, depth, generate, conv_mode="v1")
    state = DemoState()
    img = np.zeros((32, 32, 3), np.uint8)
    engine.set_image(state, img)
    assert state.depth_colorized is not None

    overlay = engine.add_regions(state, [[4, 4, 20, 20]])
    assert overlay.shape == img.shape
    assert len(state.region_masks) == 1

    resp = engine.chat(state, "How wide is <region0>?")
    assert "<mask> <depth>" in calls["prompt"]
    assert "<image>" in calls["prompt"]
    assert calls["n_masks"] == 1
    assert resp == "Region [0] is 2.0 meters wide."
    assert len(state.history) == 1
