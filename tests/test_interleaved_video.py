"""Interleaved datasets (MMC4/COYO/VFlan) and video frame extraction."""

import json

import numpy as np
from PIL import Image

from spatialrgpt_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from spatialrgpt_tpu.data.interleaved import CoyoDataset, MMC4Dataset, VFlanDataset
from spatialrgpt_tpu.data.preprocess import SiglipProcessor
from spatialrgpt_tpu.data.video import extract_frames

from test_templates import FakeTokenizer


def _img_dir(tmp_path, names):
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for n in names:
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(d / n)
    return str(d)


def test_mmc4(tmp_path):
    folder = _img_dir(tmp_path, ["a.jpg", "b.jpg"])
    f = tmp_path / "mmc4.jsonl"
    f.write_text(
        json.dumps(
            {
                "text_list": ["first sentence.", "second sentence.", "third."],
                "image_info": [
                    {"matched_text_index": 0, "image_name": "a.jpg"},
                    {"matched_text_index": 2, "image_name": "b.jpg"},
                ],
            }
        )
        + "\n"
    )
    ds = MMC4Dataset(str(f), FakeTokenizer(), SiglipProcessor(size=56), folder)
    s = ds[0]
    assert (s.input_ids == IMAGE_TOKEN_INDEX).sum() == 2
    assert s.image.shape == (2, 56, 56, 3)
    # text supervised, image placeholders masked
    assert (s.labels[s.input_ids == IMAGE_TOKEN_INDEX] == IGNORE_INDEX).all()
    assert (s.labels[s.input_ids > 0] != IGNORE_INDEX).any()


def test_coyo(tmp_path):
    folder = _img_dir(tmp_path, ["c.jpg"])
    f = tmp_path / "coyo.jsonl"
    f.write_text(json.dumps({"image": "c.jpg", "text": "a red car"}) + "\n")
    ds = CoyoDataset(str(f), FakeTokenizer(), SiglipProcessor(size=56), folder)
    s = ds[0]
    assert s.image.shape == (56, 56, 3)
    assert (s.input_ids == IMAGE_TOKEN_INDEX).sum() == 1
    assert s.labels[0] == IGNORE_INDEX  # bos masked


def test_vflan(tmp_path):
    folder = _img_dir(tmp_path, ["d.jpg"])
    f = tmp_path / "vflan.jsonl"
    f.write_text(
        json.dumps({"image": "d.jpg", "question": "what color?", "answer": "red"}) + "\n"
    )
    ds = VFlanDataset(str(f), FakeTokenizer(), SiglipProcessor(size=56), folder)
    s = ds[0]
    assert (s.input_ids == IMAGE_TOKEN_INDEX).sum() == 1
    assert s.image.shape == (56, 56, 3)


def test_video_fallback_black_frames():
    frames, total = extract_frames("/nonexistent/video.mp4", num_frames=4, size=(32, 32))
    assert len(frames) == 4 and total == 0
    assert frames[0].shape == (32, 32, 3) and frames[0].sum() == 0


def test_video_real_file(tmp_path):
    import cv2

    path = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(10):
        w.write(rng.integers(0, 255, (32, 32, 3), np.uint8))
    w.release()
    frames, total = extract_frames(path, num_frames=4)
    assert total == 10 and len(frames) == 4
    assert frames[0].shape == (32, 32, 3)
