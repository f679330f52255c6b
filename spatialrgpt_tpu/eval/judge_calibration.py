"""Calibration harness for the offline judge (VERDICT round-1 weak #5).

The reference scores SpatialRGPT-Bench with GPT-4 as the judge
(llava/eval/gpt_eval*.py); our deterministic ``LocalExtractor`` stands in
for it offline.  Two calibration surfaces:

1. An authored gold set (``CALIBRATION_SET``) of phrasing variants per
   category — comparatives, synonyms, number words, unit mixes, yes/no
   framings — each with an unambiguous gold mark.  ``calibrate()``
   reports per-category agreement of any extractor against gold;
   ``tests/test_eval.py`` gates LocalExtractor at >= 0.95 overall so
   extractor regressions are caught.
2. ``agreement_with_recorded()`` diffs LocalExtractor marks against a
   jsonl of *recorded* GPT-4 judgments (producible online with
   GPT4Extractor; schema {"category", "question", "answer", "response",
   "mark"}), so a single online run yields the LocalExtractor-vs-GPT4
   agreement table that makes offline scores interpretable.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional

# Each entry: category (bench category string), answer = ground-truth
# phrasing, response = model phrasing to be judged, gold = 1 (agrees)
# or 0 (disagrees).  Quantitative entries instead carry gt_m / gold_m
# (expected parsed meters for answer/response; None = unparseable).
CALIBRATION_SET: List[Dict] = [
    # --- left/right ---
    dict(category="left_right", answer="Region [0] is to the left of Region [1].", response="The first region is on the left.", gold=1),
    dict(category="left_right", answer="Region [0] is to the left of Region [1].", response="It is positioned to the right of Region [1].", gold=0),
    dict(category="left_right", answer="No, it is to the right.", response="No. Region [0] is right of Region [1].", gold=1),
    dict(category="left_right", answer="Yes, [A] is to the left of [B].", response="Yes, it is.", gold=1),
    dict(category="left_right", answer="Yes, [A] is to the left of [B].", response="No.", gold=0),
    # --- tall/short (comparatives) ---
    dict(category="tall_short", answer="Region [0] is taller than Region [1].", response="The first object is taller.", gold=1),
    dict(category="tall_short", answer="Region [0] is taller than Region [1].", response="Region [0] is shorter than Region [1].", gold=0),
    dict(category="tall_short", answer="[A] is shorter.", response="It is not as tall as the other one; the shorter one is [A].", gold=1),
    # --- below/above (synonyms: under/over, beneath) ---
    dict(category="below_above", answer="Region [0] is below Region [1].", response="It sits beneath Region [1].", gold=1),
    dict(category="below_above", answer="Region [0] is below Region [1].", response="Region [0] is under the shelf.", gold=1),
    dict(category="below_above", answer="Region [0] is above Region [1].", response="It is positioned over the table, above Region [1].", gold=1),
    dict(category="below_above", answer="Region [0] is above Region [1].", response="It is below.", gold=0),
    # --- behind/front ---
    dict(category="behind_front", answer="Region [0] is behind Region [1].", response="The chair is at the back, behind the desk.", gold=1),
    dict(category="behind_front", answer="Region [0] is in front of Region [1].", response="It stands in front of the sofa.", gold=1),
    dict(category="behind_front", answer="Region [0] is in front of Region [1].", response="It is behind the sofa.", gold=0),
    # --- big/small (comparatives: larger/smaller) ---
    dict(category="big_small", answer="Region [0] is bigger than Region [1].", response="The first one is larger.", gold=1),
    dict(category="big_small", answer="Region [0] is smaller.", response="Region [0] is the smaller of the two.", gold=1),
    dict(category="big_small", answer="Region [0] is bigger than Region [1].", response="It is smaller than Region [1].", gold=0),
    # --- wide/thin (comparatives: wider/narrower/thinner) ---
    dict(category="wide_thin", answer="Region [0] is wider than Region [1].", response="The crate is wider.", gold=1),
    dict(category="wide_thin", answer="Region [0] is thinner than Region [1].", response="Region [0] is narrower than Region [1].", gold=1),
    dict(category="wide_thin", answer="Region [0] is wider than Region [1].", response="It looks thinner.", gold=0),
    # --- yes/no framings ---
    dict(category="tall_short", answer="Yes.", response="Yes, that's correct.", gold=1),
    dict(category="tall_short", answer="Yes.", response="No, it is not.", gold=0),
    dict(category="big_small", answer="No.", response="no - the opposite.", gold=1),
    # --- quantitative: unit/parse variants (gt_m = parsed meters) ---
    dict(category="distance_data", answer="1.5 meters", response="The distance is 1.5 m.", gt_m=1.5, gold_m=1.5),
    dict(category="distance_data", answer="80 cm", response="about 0.8 meters", gt_m=0.8, gold_m=0.8),
    dict(category="width_data", answer="2 feet", response="around 24 inches", gt_m=0.6096, gold_m=0.6096),
    dict(category="height_data", answer="1.2 m", response="It is roughly 120 centimeters tall.", gt_m=1.2, gold_m=1.2),
    dict(category="distance_data", answer="3.0 meters", response="3", gt_m=3.0, gold_m=3.0),
    dict(category="width_data", answer="0.5 m", response="half a meter", gt_m=0.5, gold_m=0.5),
    dict(category="height_data", answer="2 meters", response="two meters tall", gt_m=2.0, gold_m=2.0),
    dict(category="distance_data", answer="1.75 meters", response="approximately 1.75m away", gt_m=1.75, gold_m=1.75),
    dict(category="vertical_distance_data", answer="30 cm", response="0.3 meters vertically", gt_m=0.3, gold_m=0.3),
    dict(category="horizontal_distance_data", answer="4 ft", response='48"', gt_m=1.2192, gold_m=1.2192),
    # --- direction (clock) ---
    dict(category="direction", answer="3 o'clock", response="at roughly 3 o'clock", clock_gt=3, clock_gold=3),
    dict(category="direction", answer="10 o'clock", response="about 10 oclock from here", clock_gt=10, clock_gold=10),
    dict(category="direction", answer="12 o'clock", response="directly ahead, 12 o clock", clock_gt=12, clock_gold=12),
]


def calibrate(extractor) -> Dict:
    """Score an extractor against the authored gold set.

    Returns {overall, per_category: {cat: {n, agree}}, failures: [...]}.
    """
    per: Dict[str, Dict] = {}
    failures = []
    n_total = n_agree = 0
    for e in CALIBRATION_SET:
        cat = e["category"]
        rec = per.setdefault(cat, {"n": 0, "agree": 0})
        if "gold" in e:
            mark = extractor.judge_qualitative(
                e.get("question", ""), e["answer"], e["response"], cat
            )
            ok = mark == e["gold"]
        elif "gt_m" in e:
            gt, pred = extractor.extract_distance(
                e.get("question", ""), e["answer"], e["response"]
            )
            ok = (
                gt is not None and pred is not None
                and abs(gt - e["gt_m"]) < 1e-3
                and abs(pred - e["gold_m"]) < 1e-3
            )
        else:
            gt, pred = extractor.extract_direction(
                e.get("question", ""), e["answer"], e["response"]
            )
            ok = gt == e["clock_gt"] and pred == e["clock_gold"]
        rec["n"] += 1
        n_total += 1
        if ok:
            rec["agree"] += 1
            n_agree += 1
        else:
            failures.append(e)
    return {
        "overall": n_agree / max(n_total, 1),
        "per_category": {
            c: {"n": r["n"], "agreement": r["agree"] / r["n"]} for c, r in per.items()
        },
        "failures": failures,
    }


def agreement_with_recorded(
    recorded_jsonl: str, extractor=None
) -> Dict:
    """Agreement of LocalExtractor vs recorded GPT-4 judgments.

    ``recorded_jsonl`` rows: {"category", "question", "answer",
    "response", "mark"} — produced online by running GPT4Extractor over
    bench answers and recording its marks.  Returns the same shape as
    ``calibrate`` (gold = the recorded GPT-4 mark).
    """
    from spatialrgpt_tpu.eval.judge import LocalExtractor

    ex = extractor or LocalExtractor()
    per: Dict[str, Dict] = {}
    n_total = n_agree = 0
    with open(recorded_jsonl) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            mark = ex.judge_qualitative(
                row.get("question", ""), row["answer"], row["response"],
                row["category"],
            )
            rec = per.setdefault(row["category"], {"n": 0, "agree": 0})
            rec["n"] += 1
            n_total += 1
            if int(mark) == int(row["mark"]):
                rec["agree"] += 1
                n_agree += 1
    return {
        "overall": n_agree / max(n_total, 1),
        "per_category": {
            c: {"n": r["n"], "agreement": r["agree"] / r["n"]} for c, r in per.items()
        },
    }
