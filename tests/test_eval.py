"""Judge metrics (offline extractor) and the batched bench runner."""

import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

from spatialrgpt_tpu.eval.judge import LocalExtractor, compute_errors, score_answers

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)


def _rec(qtype, category, gt, pred, q="How far is Region [0] from Region [1]?"):
    return {
        "question": q,
        "gt": gt,
        "pred": pred,
        "qa_info": {"type": qtype, "category": category},
    }


def test_local_extractor_units():
    ex = LocalExtractor()
    assert ex.meters("It is 2.5 meters wide") == pytest.approx(2.5)
    assert ex.meters("about 30 cm") == pytest.approx(0.3)
    assert ex.meters("10.0 inches") == pytest.approx(0.254)
    assert ex.meters("22.32 feet") == pytest.approx(6.803, abs=1e-2)
    assert ex.clock("around the 2 o'clock direction") == 2
    assert ex.clock("at 11 o'clock") == 11


def test_quantitative_scoring():
    lines = [
        _rec("quantitative", "distance_data", "5 meters", "5.5 meters"),  # within 1.25x
        _rec("quantitative", "distance_data", "5 meters", "10 meters"),  # fail
        _rec("quantitative", "width_data", "1.0 meters", "100 cm"),  # exact
        _rec("quantitative", "direction", "2 o'clock", "3 o'clock"),  # err 1 -> ok
        _rec("quantitative", "direction", "12 o'clock", "6 o'clock"),  # err 6 -> fail
    ]
    res = score_answers(lines)
    assert res["Quan_direct_distance_acc"] == pytest.approx(50.0)
    assert res["Quan_width_acc"] == pytest.approx(100.0)
    assert res["Quan_direction_acc"] == pytest.approx(50.0)
    assert res["Quan_overall_acc"] == pytest.approx(60.0)
    assert "Quan_distance_data_absrel" in res


def test_qualitative_scoring():
    lines = [
        _rec("qualitative", "left_predicate", "Region [0] is to the left.", "It is on the left side."),
        _rec("qualitative", "left_predicate", "Region [0] is to the left.", "It is on the right."),
        _rec("qualitative", "tall_predicate", "Region [0] is taller.", "Region [0] is taller than Region [1]."),
        _rec("qualitative", "behind_predicate", "It is behind.", "It is in front."),
    ]
    res = score_answers(lines)
    assert res["Qual_left/right_acc"] == pytest.approx(50.0)
    assert res["Qual_tall/short_acc"] == pytest.approx(100.0)
    assert res["Qual_behind/front_acc"] == pytest.approx(0.0)
    assert res["Qual_overall_acc"] == pytest.approx(50.0)


def test_compute_errors_formulas():
    gt = np.array([1.0, 2.0, 4.0])
    pred = np.array([1.0, 2.0, 4.0])
    e = compute_errors(gt, pred)
    assert e["a1"] == 1.0 and e["abs_rel"] == 0.0 and e["rmse"] == 0.0
    e2 = compute_errors(np.array([1.0]), np.array([2.0]))
    assert e2["a1"] == 0.0 and e2["abs_rel"] == pytest.approx(1.0)


def test_bench_runner_end_to_end(tmp_path):
    """Tiny model + fake tokenizer through the full bench loop."""
    import jax

    from spatialrgpt_tpu.eval.spatial_bench import BenchConfig, run_bench
    from spatialrgpt_tpu.data.preprocess import SiglipProcessor, rle_encode
    from spatialrgpt_tpu.models import vlm
    import __graft_entry__ as graft
    from test_templates import FakeTokenizer

    cfg = graft._tiny_cfg()
    cfg = cfg.replace(mask_token_id=1009, depth_token_id=1010, model_max_length=512)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTokenizer()
    tok.model_max_length = 512
    processor = SiglipProcessor(size=cfg.vision.image_size)

    # fabricate bench data
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (60, 80, 3), np.uint8)).save(img_dir / "a.jpg")
    mask = np.zeros((60, 80), np.uint8)
    mask[10:30, 20:50] = 1
    ann = [
        {
            "id": "q0",
            "image_info": {"file_path": "a.jpg", "height": 60, "width": 80},
            "text_q": "How wide is <mask>?",
            "qa_info": {"type": "quantitative", "category": "width_data"},
            "rle": [rle_encode(mask)],
            "bbox": [[20, 10, 50, 30]],
            "conversations": [
                {"from": "human", "value": "<image>\nHow wide is Region [0] <mask>?"},
                {"from": "gpt", "value": "1.0 meters"},
                {"from": "human", "value": "How tall is Region [0] <mask>?"},
                {"from": "gpt", "value": "2.0 meters"},
            ],
        }
    ]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))

    # depth_source defaults to "model" (the reference's always-on
    # Depth-Anything protocol) — run it with a tiny DA predictor
    from spatialrgpt_tpu.models import depth_anything as da
    from test_depth_anything import TINY as DA_TINY

    da_params = da.init_params(jax.random.PRNGKey(7), DA_TINY)
    predictor = da.DepthPredictor(da_params, DA_TINY, target=DA_TINY.patch_size * 4)

    bcfg = BenchConfig(
        model_path="",
        annotation_file=str(ann_file),
        image_folder=str(img_dir),
        answers_file=str(tmp_path / "out" / "answers.jsonl"),
        conv_mode="v1",
        batch_size=2,
        max_new_tokens=4,
        prompt_bucket=256,
        regions_per_image=2,
    )
    out = run_bench(bcfg, model=(tok, params, cfg, processor), depth_model=predictor)
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 2  # one record per conversation round
    assert lines[0]["gt"] == "1.0 meters"
    assert lines[1]["gt"] == "2.0 meters"
    assert lines[0]["qa_info"]["category"] == "width_data"
    assert isinstance(lines[0]["pred"], str)

    # without a predictor the model default must refuse rather than
    # silently fall back to RGB-as-depth
    import pytest

    with pytest.raises(ValueError, match="depth_source"):
        run_bench(
            dataclasses.replace(
                bcfg, answers_file=str(tmp_path / "out" / "answers_x.jsonl")
            ),
            model=(tok, params, cfg, processor),
        )

    # quantized serving mode through the same loop (W8A8 + int8 KV);
    # rgb fallback is an explicit opt-in
    bcfg2 = dataclasses.replace(
        bcfg, answers_file=str(tmp_path / "out" / "answers_q.jsonl"),
        w8a8=True, kv_quant=True, depth_source="rgb",
    )
    out2 = run_bench(bcfg2, model=(tok, params, cfg, processor))
    lines2 = [json.loads(l) for l in open(out2)]
    assert len(lines2) == 2 and isinstance(lines2[0]["pred"], str)


def test_bench_multi_round_prompt_accumulation():
    """Round >=2 prompts must accumulate earlier rounds (and therefore keep
    the ``<image>`` token, which only appears in round 1's text) — reference
    eval_spatial.py:200-211 semantics."""
    from spatialrgpt_tpu.eval.spatial_bench import build_round_prompts

    conversations = [
        {"from": "human", "value": "<image>\nHow wide is Region [0] <mask>?"},
        {"from": "gpt", "value": "1.0 meters"},
        {"from": "human", "value": "How tall is Region [0] <mask>?"},
        {"from": "gpt", "value": "2.0 meters"},
    ]
    for mode in ("v1", "llama_3"):
        p1, p2 = build_round_prompts(mode, conversations)
        assert "<image>" in p1 and "How wide" in p1
        # round 2 keeps the image token and round 1's question
        assert "<image>" in p2
        assert "How wide is Region [0] <mask> <depth>?" in p2
        assert "How tall is Region [0] <mask> <depth>?" in p2
        # no model answer is inserted (reference leaves assistant slots None)
        assert "1.0 meters" not in p2
        # prompt 2 strictly extends prompt 1's question prefix
        assert p2.startswith(p1[: p1.index("How wide")])


def test_region_cls_runner(tmp_path):
    import jax

    from spatialrgpt_tpu.data.preprocess import SiglipProcessor
    from spatialrgpt_tpu.eval.region_cls import run_region_cls, score_region_predictions
    from spatialrgpt_tpu.models import vlm
    import __graft_entry__ as graft
    from test_templates import FakeTokenizer

    cfg = graft._tiny_cfg().replace(mask_token_id=1009, depth_token_id=1010, model_max_length=512)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTokenizer()
    tok.model_max_length = 512
    processor = SiglipProcessor(size=cfg.vision.image_size)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (80, 100, 3), np.uint8)).save(img_dir / "z.jpg")
    items = [
        {
            "file_name": "z.jpg",
            "image_info": {"height": 80, "width": 100},
            "bbox": [10, 10, 40, 50],
            "category": "dog",
        }
    ]
    out = run_region_cls(
        (tok, params, cfg, processor),
        items,
        str(img_dir),
        answers_file=str(tmp_path / "rc.jsonl"),
        conv_mode="v1",
        batch_size=2,
        max_new_tokens=3,
        prompt_bucket=384,
    )
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 1 and recs[0]["gt_category"] == "dog"
    res = score_region_predictions(recs)
    assert "accuracy" in res


def test_bench_to_judge_pipeline(tmp_path):
    """answers.jsonl -> score_file -> score.json (the srgpt_bench.sh flow)."""
    from spatialrgpt_tpu.eval.judge import score_file

    answers = tmp_path / "answers.jsonl"
    with open(answers, "w") as f:
        f.write(json.dumps(_rec("quantitative", "width_data", "2 meters", "2.1 meters")) + "\n")
        f.write(json.dumps(_rec("qualitative", "left_predicate", "It is left.", "on the left")) + "\n")
    res = score_file(str(answers))
    assert os.path.exists(tmp_path / "score.json")
    assert res["Quan_width_acc"] == 100.0
    assert res["Qual_left/right_acc"] == 100.0


def test_judge_prompt_bank_covers_all_categories():
    """Few-shot bank: 12 predicate categories + choice, each with agree /
    disagree / double-negation examples; the assembled prompt carries the
    item under judgment and the JSON mark contract."""
    from spatialrgpt_tpu.eval.judge_prompts import build_qualitative_prompt, qualitative_examples

    bank = qualitative_examples()
    stems = ["left", "right", "above", "below", "behind", "front",
             "big", "small", "tall", "short", "wide", "thin"]
    assert set(bank) == {f"{s}_predicate" for s in stems} | {"choice"}
    for key, block in bank.items():
        assert '"your_mark": 1' in block and '"your_mark": 0' in block
        if key != "choice":
            assert "{question}" in block

    p = build_qualitative_prompt(
        "Is Region [0] to the left of Region [1]?",
        "Yes, Region [0] is to the left of Region [1].",
        "Region [0] is on the left.",
        "left_predicate",
    )
    assert "Is Region [0] to the left of Region [1]?" in p
    assert "Your Turn:" in p and '"your_mark"' in p
    assert "{question}" not in p  # placeholder fully substituted

    # choice categories route to the choice block
    pc = build_qualitative_prompt("Which is taller?", "Region [0].", "Region [1].", "tall_choice")
    assert "Which one is taller, Region [0] or Region [1]?" in pc


def test_local_extractor_calibration():
    """Gold-set gate: phrasing variants (comparatives, synonyms, number
    words, unit mixes, negation, yes/no fallback) must stay >= 0.95."""
    from spatialrgpt_tpu.eval.judge import LocalExtractor
    from spatialrgpt_tpu.eval.judge_calibration import calibrate

    r = calibrate(LocalExtractor())
    assert r["overall"] >= 0.95, r["failures"]


def test_recorded_judgment_agreement(tmp_path):
    from spatialrgpt_tpu.eval.judge_calibration import agreement_with_recorded

    rows = [
        {"category": "left_right", "question": "", "answer": "It is left.",
         "response": "On the left.", "mark": 1},
        {"category": "left_right", "question": "", "answer": "It is left.",
         "response": "On the right.", "mark": 0},
        # a row where GPT-4 would disagree with the regex matcher
        {"category": "tall_short", "question": "", "answer": "Taller.",
         "response": "The metal one.", "mark": 1},
    ]
    p = tmp_path / "recorded.jsonl"
    import json

    p.write_text("\n".join(json.dumps(r) for r in rows))
    r = agreement_with_recorded(str(p))
    assert r["per_category"]["left_right"]["agreement"] == 1.0
    assert 0.0 <= r["overall"] <= 1.0


def test_bench_runner_tp2_matches_single_device(tmp_path):
    """The eval runner under tensor-parallel serving (BenchConfig.tp=2)
    writes the same predictions/ids as tp=1 — the path a model larger
    than one chip's HBM takes through the reference protocol."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >= 2 devices")

    from spatialrgpt_tpu.eval.spatial_bench import BenchConfig, run_bench
    from spatialrgpt_tpu.data.preprocess import SiglipProcessor, rle_encode
    from spatialrgpt_tpu.models import vlm
    import __graft_entry__ as graft
    from test_templates import FakeTokenizer

    cfg = graft._tiny_cfg()
    cfg = cfg.replace(mask_token_id=1009, depth_token_id=1010, model_max_length=512)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTokenizer()
    tok.model_max_length = 512
    processor = SiglipProcessor(size=cfg.vision.image_size)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (60, 80, 3), np.uint8)).save(img_dir / "a.jpg")
    mask = np.zeros((60, 80), np.uint8)
    mask[10:30, 20:50] = 1
    ann = [
        {
            "id": "q0",
            "image_info": {"file_path": "a.jpg", "height": 60, "width": 80},
            "text_q": "How wide is <mask>?",
            "qa_info": {"type": "quantitative", "category": "width_data"},
            "rle": [rle_encode(mask)],
            "bbox": [[20, 10, 50, 30]],
            "conversations": [
                {"from": "human", "value": "<image>\nHow wide is Region [0] <mask>?"},
                {"from": "gpt", "value": "1.0 meters"},
            ],
        }
    ]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))

    def run(tp, name):
        bcfg = BenchConfig(
            model_path="",
            annotation_file=str(ann_file),
            image_folder=str(img_dir),
            answers_file=str(tmp_path / name),
            conv_mode="v1",
            batch_size=2,
            max_new_tokens=4,
            prompt_bucket=256,
            regions_per_image=2,
            depth_source="rgb",
            tp=tp,
        )
        out = run_bench(bcfg, model=(tok, params, cfg, processor))
        return [json.loads(l)["output_ids"] for l in open(out)]

    assert run(2, "tp2.jsonl") == run(1, "tp1.jsonl")
