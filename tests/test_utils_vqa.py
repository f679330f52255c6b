"""Delta tools, profiling helpers, and the generic VQA runner."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

import __graft_entry__ as graft
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.utils.delta import apply_delta, make_delta
from spatialrgpt_tpu.utils.profiling import device_memory_report, stopwatch


def test_delta_roundtrip():
    cfg = graft._tiny_cfg()
    base = vlm.init_params(jax.random.PRNGKey(0), cfg)
    target = vlm.init_params(jax.random.PRNGKey(1), cfg)
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(target)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_stopwatch_and_memory_report():
    sink = {}
    with stopwatch("x", sink):
        pass
    assert "x" in sink
    rep = device_memory_report()
    assert len(rep) >= 1


def test_vqa_runner(tmp_path):
    from spatialrgpt_tpu.data.preprocess import SiglipProcessor
    from spatialrgpt_tpu.eval.vqa import VQAConfig, run_vqa
    from test_templates import FakeTokenizer

    cfg = graft._tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTokenizer()
    tok.model_max_length = 512
    processor = SiglipProcessor(size=cfg.vision.image_size)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (50, 60, 3), np.uint8)).save(img_dir / "x.jpg")
    qf = tmp_path / "q.jsonl"
    qf.write_text(
        json.dumps({"question_id": 1, "image": "x.jpg", "text": "what is this?"}) + "\n"
    )
    vcfg = VQAConfig(
        question_file=str(qf),
        image_folder=str(img_dir),
        answers_file=str(tmp_path / "a.jsonl"),
        conv_mode="v1",
        batch_size=2,
        max_new_tokens=3,
        prompt_bucket=256,
    )
    out = run_vqa(vcfg, (tok, params, cfg, processor))
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 1 and lines[0]["question_id"] == 1
    assert isinstance(lines[0]["text"], str)
