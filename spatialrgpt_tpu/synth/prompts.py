"""QA template generation over 3D object pairs.

Rebuild of dataset_pipeline/osdsynth/processor/prompt.py: the 18
qualitative predicate/choice families and 6 quantitative generators, with
the exact geometric decision rules (x-left convention: ``is_left`` <=>
A.center.x > B.center.x, prompt.py:10-31; wide/tall/big from AABB extents;
clock direction on the (x, z) ground plane; distances via symmetric mean
point-cloud distance).  Template wordings are our own paraphrase bank with
the same [A]/[B]/[X] slot structure.
"""

from __future__ import annotations

import random
from itertools import combinations
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from spatialrgpt_tpu.synth.geometry import (
    PointCloud,
    average_cloud_distance,
    calculate_angle_clockwise,
    human_like_distance,
)

# ---------------------------------------------------------------------------
# Template banks (own wording, same slot structure)
# ---------------------------------------------------------------------------

T = Dict[str, List[str]]

PREDICATE_TEMPLATES: T = {
    "left_q": [
        "Is [A] to the left of [B]?",
        "From the viewer's perspective, does [A] appear on the left side of [B]?",
        "Would you say [A] is positioned left of [B]?",
    ],
    "left_true": [
        "Yes, [A] is to the left of [B].",
        "Correct, you will find [A] on the left side of [B].",
    ],
    "left_false": [
        "No, [A] is not on the left of [B].",
        "Incorrect, [A] is actually to the right of [B].",
    ],
    "right_q": [
        "Is [A] to the right of [B]?",
        "Does [A] sit on the right side of [B] from this view?",
    ],
    "right_true": ["Yes, [A] is to the right of [B]."],
    "right_false": ["No, [A] is not to the right of [B]."],
    "above_q": [
        "Is [A] above [B]?",
        "Does [A] sit higher than [B]?",
    ],
    "above_true": ["Yes, [A] is above [B]."],
    "above_false": ["No, [A] is below [B]."],
    "below_q": ["Is [A] below [B]?", "Is [A] positioned under [B]?"],
    "below_true": ["Yes, [A] is below [B]."],
    "below_false": ["No, [A] is above [B]."],
    "wide_q": ["Is [A] wider than [B]?", "Does [A] have a greater width than [B]?"],
    "wide_true": ["Yes, [A] is wider than [B]."],
    "wide_false": ["No, [A] is narrower than [B]."],
    "thin_q": ["Is [A] thinner than [B]?"],
    "thin_true": ["Yes, [A] is thinner than [B]."],
    "thin_false": ["No, [A] is wider than [B]."],
    "big_q": ["Is [A] bigger than [B]?", "Does [A] take up more space than [B]?"],
    "big_true": ["Yes, [A] is bigger than [B]."],
    "big_false": ["No, [A] is smaller than [B]."],
    "small_q": ["Is [A] smaller than [B]?"],
    "small_true": ["Yes, [A] is smaller than [B]."],
    "small_false": ["No, [A] is bigger than [B]."],
    "tall_q": ["Is [A] taller than [B]?"],
    "tall_true": ["Yes, [A] is taller than [B]."],
    "tall_false": ["No, [A] is shorter than [B]."],
    "short_q": ["Is [A] shorter than [B]?"],
    "short_true": ["Yes, [A] is shorter than [B]."],
    "short_false": ["No, [A] is taller than [B]."],
    "behind_q": ["Is [A] behind [B]?", "Is [A] farther from the camera than [B]?"],
    "behind_true": ["Yes, [A] is behind [B]."],
    "behind_false": ["No, [A] is in front of [B]."],
    "front_q": ["Is [A] in front of [B]?"],
    "front_true": ["Yes, [A] is in front of [B]."],
    "front_false": ["No, [A] is behind [B]."],
}

CHOICE_TEMPLATES: T = {
    "left_q": ["Which is more to the left, [A] or [B]?"],
    "right_q": ["Which is more to the right, [A] or [B]?"],
    "above_q": ["Which is higher up, [A] or [B]?"],
    "below_q": ["Which is lower down, [A] or [B]?"],
    "tall_q": ["Which is taller, [A] or [B]?"],
    "short_q": ["Which is shorter, [A] or [B]?"],
    "answer": ["[X] is the one.", "That would be [X]."],
}

QUANT_TEMPLATES: T = {
    "vertical_distance_q": [
        "How far apart are [A] and [B] vertically?",
        "What is the vertical gap between [A] and [B]?",
    ],
    "vertical_distance_a": [
        "[A] and [B] are [X] apart vertically.",
        "The vertical distance between [A] and [B] is [X].",
    ],
    "horizontal_distance_q": [
        "How far apart are [A] and [B] horizontally?",
    ],
    "horizontal_distance_a": [
        "[A] and [B] are [X] apart horizontally.",
    ],
    "distance_q": [
        "How far is [A] from [B]?",
        "What is the distance between [A] and [B]?",
    ],
    "distance_a": [
        "[A] and [B] are [X] apart.",
        "The distance between [A] and [B] is [X].",
    ],
    "width_q": ["How wide is [A]?", "Measure the width of [A]."],
    "width_a": ["[A] is [X] wide.", "The width of [A] is [X]."],
    "height_q": ["How tall is [A]?", "What is the height of [A]?"],
    "height_a": ["[A] is [X] tall.", "The height of [A] is [X]."],
    "direction_q": [
        "If you are at [A], where will you find [B]?",
    ],
    "direction_a": [
        "[B] is around the [X] o'clock direction from [A].",
    ],
}


# ---------------------------------------------------------------------------
# Predicates (decision rules mirrored from prompt.py)
# ---------------------------------------------------------------------------


def _fill(template: str, A: str, B: str = "", X: str = "") -> str:
    return template.replace("[A]", A).replace("[B]", B).replace("[X]", X)


def _qa(bank_q, true_bank, false_bank, truth, A_desc, B_desc, rng) -> Tuple[str, str]:
    q = _fill(rng.choice(bank_q), A_desc, B_desc)
    a = _fill(rng.choice(true_bank if truth else false_bank), A_desc, B_desc)
    return q, a


def _bool_predicate(key: str, truth_fn: Callable):
    def fn(A, B, rng=random):
        a_desc, b_desc = A["caption"].lower(), B["caption"].lower()
        truth = truth_fn(A["pcd"], B["pcd"])
        return _qa(
            PREDICATE_TEMPLATES[f"{key}_q"],
            PREDICATE_TEMPLATES[f"{key}_true"],
            PREDICATE_TEMPLATES[f"{key}_false"],
            truth,
            a_desc,
            b_desc,
            rng,
        )

    fn.__name__ = f"{key}_predicate"
    return fn


# frame: +x is LEFT (geometry.unproject flips), +y up, +z forward
left_predicate = _bool_predicate("left", lambda a, b: a.get_center()[0] > b.get_center()[0])
right_predicate = _bool_predicate("right", lambda a, b: a.get_center()[0] < b.get_center()[0])
above_predicate = _bool_predicate("above", lambda a, b: a.get_center()[1] > b.get_center()[1])
below_predicate = _bool_predicate("below", lambda a, b: a.get_center()[1] < b.get_center()[1])
wide_predicate = _bool_predicate("wide", lambda a, b: a.extent()[0] > b.extent()[0])
thin_predicate = _bool_predicate("thin", lambda a, b: a.extent()[0] < b.extent()[0])
big_predicate = _bool_predicate("big", lambda a, b: np.prod(a.extent()) > np.prod(b.extent()))
small_predicate = _bool_predicate("small", lambda a, b: np.prod(a.extent()) < np.prod(b.extent()))
tall_predicate = _bool_predicate("tall", lambda a, b: a.extent()[1] > b.extent()[1])
short_predicate = _bool_predicate("short", lambda a, b: a.extent()[1] < b.extent()[1])
behind_predicate = _bool_predicate("behind", lambda a, b: a.get_center()[2] > b.get_center()[2])
front_predicate = _bool_predicate("front", lambda a, b: a.get_center()[2] < b.get_center()[2])


def _choice(key: str, winner_fn: Callable):
    def fn(A, B, rng=random):
        a_desc, b_desc = A["caption"].lower(), B["caption"].lower()
        winner = a_desc if winner_fn(A["pcd"], B["pcd"]) else b_desc
        q = _fill(rng.choice(CHOICE_TEMPLATES[f"{key}_q"]), a_desc, b_desc)
        a = _fill(rng.choice(CHOICE_TEMPLATES["answer"]), a_desc, b_desc, winner)
        return q, a

    fn.__name__ = f"{key}_choice"
    return fn


left_choice = _choice("left", lambda a, b: a.get_center()[0] > b.get_center()[0])
right_choice = _choice("right", lambda a, b: a.get_center()[0] < b.get_center()[0])
above_choice = _choice("above", lambda a, b: a.get_center()[1] > b.get_center()[1])
below_choice = _choice("below", lambda a, b: a.get_center()[1] < b.get_center()[1])
tall_choice = _choice("tall", lambda a, b: a.extent()[1] > b.extent()[1])
short_choice = _choice("short", lambda a, b: a.extent()[1] < b.extent()[1])


# ---------------------------------------------------------------------------
# Quantitative generators
# ---------------------------------------------------------------------------


def vertical_distance_data(A, B, rng=random):
    a_desc, b_desc = A["caption"].lower(), B["caption"].lower()
    dist = abs(A["pcd"].get_center()[1] - B["pcd"].get_center()[1])
    x = human_like_distance(dist, rng)
    q = _fill(rng.choice(QUANT_TEMPLATES["vertical_distance_q"]), a_desc, b_desc)
    a = _fill(rng.choice(QUANT_TEMPLATES["vertical_distance_a"]), a_desc, b_desc, x)
    return q, a


def horizontal_distance_data(A, B, rng=random):
    a_desc, b_desc = A["caption"].lower(), B["caption"].lower()
    dist = abs(A["pcd"].get_center()[0] - B["pcd"].get_center()[0])
    x = human_like_distance(dist, rng)
    q = _fill(rng.choice(QUANT_TEMPLATES["horizontal_distance_q"]), a_desc, b_desc)
    a = _fill(rng.choice(QUANT_TEMPLATES["horizontal_distance_a"]), a_desc, b_desc, x)
    return q, a


def distance_data(A, B, rng=random):
    a_desc, b_desc = A["caption"].lower(), B["caption"].lower()
    x = human_like_distance(average_cloud_distance(A["pcd"], B["pcd"]), rng)
    q = _fill(rng.choice(QUANT_TEMPLATES["distance_q"]), a_desc, b_desc)
    a = _fill(rng.choice(QUANT_TEMPLATES["distance_a"]), a_desc, b_desc, x)
    return q, a


def width_data(A, B=None, rng=random):
    a_desc = A["caption"].lower()
    x = human_like_distance(float(A["pcd"].extent()[0]), rng)
    return (
        _fill(rng.choice(QUANT_TEMPLATES["width_q"]), a_desc),
        _fill(rng.choice(QUANT_TEMPLATES["width_a"]), a_desc, "", x),
    )


def height_data(A, B=None, rng=random):
    a_desc = A["caption"].lower()
    x = human_like_distance(float(A["pcd"].extent()[1]), rng)
    return (
        _fill(rng.choice(QUANT_TEMPLATES["height_q"]), a_desc),
        _fill(rng.choice(QUANT_TEMPLATES["height_a"]), a_desc, "", x),
    )


def direction(A, B, rng=random):
    a_desc, b_desc = A["caption"].lower(), B["caption"].lower()
    a_c, b_c = A["pcd"].get_center(), B["pcd"].get_center()
    clock = calculate_angle_clockwise((a_c[0], a_c[2]), (b_c[0], b_c[2]))
    q = _fill(rng.choice(QUANT_TEMPLATES["direction_q"]), a_desc, b_desc)
    a = _fill(rng.choice(QUANT_TEMPLATES["direction_a"]), a_desc, b_desc, str(int(clock)))
    return q, a


QUALITATIVE_PROMPTS = [
    left_predicate,
    left_choice,
    right_predicate,
    right_choice,
    wide_predicate,
    thin_predicate,
    big_predicate,
    small_predicate,
    behind_predicate,
    front_predicate,
    tall_predicate,
    tall_choice,
    short_predicate,
    short_choice,
    above_predicate,
    above_choice,
    below_predicate,
    below_choice,
]

QUANTITATIVE_PROMPTS = [
    direction,
    vertical_distance_data,
    horizontal_distance_data,
    width_data,
    height_data,
    distance_data,
]


class PromptGenerator:
    """Pair selection + predicate sampling (prompt.py:597-652)."""

    def __init__(self, n_pairs: int = 3, n_conv: int = 3, seed: Optional[int] = None):
        self.n_pairs = n_pairs
        self.n_conv = n_conv
        self.rng = random.Random(seed)

    def evaluate_predicates_on_pairs(self, detections: List[Dict]) -> List[Tuple]:
        combos = list(combinations(range(len(detections)), 2))
        self.rng.shuffle(combos)
        selected = combos[: self.n_pairs]
        prompts = QUALITATIVE_PROMPTS + QUANTITATIVE_PROMPTS
        results = []
        for i, j in selected:
            A, B = detections[i], detections[j]
            for fn in self.rng.sample(prompts, self.n_conv):
                results.append((fn(A, B, rng=self.rng), A, B, fn.__name__))
        return results


# ---------------------------------------------------------------------------
# Facts & instruction-style variants (run_template_facts.py / instruction.py)
# ---------------------------------------------------------------------------

FACT_TEMPLATES: T = {
    "left": ["[A] is to the left of [B]."],
    "right": ["[A] is to the right of [B]."],
    "above": ["[A] is above [B]."],
    "below": ["[A] is below [B]."],
    "wide": ["[A] is wider than [B]."],
    "thin": ["[A] is thinner than [B]."],
    "big": ["[A] is bigger than [B]."],
    "small": ["[A] is smaller than [B]."],
    "tall": ["[A] is taller than [B]."],
    "short": ["[A] is shorter than [B]."],
    "behind": ["[A] is behind [B]."],
    "front": ["[A] is in front of [B]."],
    "distance": ["[A] and [B] are [X] apart."],
    "width": ["[A] is [X] wide."],
    "height": ["[A] is [X] tall."],
}


def facts_for_pair(A: Dict, B: Dict, rng=random) -> List[str]:
    """Declarative spatial facts for one object pair (the facts-generation
    path, run_template_facts.py): only TRUE statements are emitted."""
    a, b = A["caption"].lower(), B["caption"].lower()
    pa, pb = A["pcd"], B["pcd"]
    facts = []

    def emit(key, A_desc=a, B_desc=b, X=""):
        facts.append(_fill(rng.choice(FACT_TEMPLATES[key]), A_desc, B_desc, X))

    emit("left" if pa.get_center()[0] > pb.get_center()[0] else "right")
    emit("above" if pa.get_center()[1] > pb.get_center()[1] else "below")
    emit("behind" if pa.get_center()[2] > pb.get_center()[2] else "front")
    emit("wide" if pa.extent()[0] > pb.extent()[0] else "thin")
    emit("tall" if pa.extent()[1] > pb.extent()[1] else "short")
    emit("big" if np.prod(pa.extent()) > np.prod(pb.extent()) else "small")
    emit("distance", X=human_like_distance(average_cloud_distance(pa, pb), rng))
    emit("width", X=human_like_distance(float(pa.extent()[0]), rng))
    emit("height", X=human_like_distance(float(pa.extent()[1]), rng))
    return facts


def tag_regions(text: str, detections: List[Dict]) -> str:
    """Replace object captions with 'Region [i] <mask>' tags so facts/QA
    become region-grounded instruction data (instruction.py's tagged
    variant; the <mask> token count must match the region count)."""
    out = text
    for i, det in enumerate(detections):
        cap = det["caption"].lower()
        out = out.replace(cap, f"Region [{i}] <mask>")
    return out


class InstructionGenerator(PromptGenerator):
    """PromptGenerator emitting region-tagged instruction conversations
    (instruction.py + instruction_template.py behavior)."""

    def conversations(self, detections: List[Dict]) -> List[Dict]:
        results = self.evaluate_predicates_on_pairs(detections)
        convs = []
        for (q, a), A, B, name in results:
            convs.append(
                {
                    "from_pair": (A["caption"], B["caption"]),
                    "type": name,
                    "conversations": [
                        {"from": "human", "value": tag_regions(q, detections)},
                        {"from": "gpt", "value": tag_regions(a, detections)},
                    ],
                }
            )
        return convs
