"""Label-masking invariants for the template preprocessors, using a fake
character-level tokenizer with llama-style BOS behavior."""

import numpy as np
import pytest

from spatialrgpt_tpu import conversation as conversation_lib
from spatialrgpt_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from spatialrgpt_tpu.data import templates
from spatialrgpt_tpu.data.tokenize import tokenizer_image_token


class FakeTokens:
    def __init__(self, ids):
        self.input_ids = ids


class FakeTokenizer:
    """Character tokenizer; special strings are single tokens; BOS prepended
    on every call (llama-1/2 style)."""

    SPECIALS = [
        "<|begin_of_text|>",
        "<|start_header_id|>",
        "<|end_header_id|>",
        "<|eot_id|>",
        "<|end_of_text|>",
        "</s>",
        "<s>",
        "[/INST]",
        "[INST]",
        "<mask>",
        "<depth>",
    ]

    def __init__(self, prepend_bos=True):
        self.vocab = {s: 1000 + i for i, s in enumerate(self.SPECIALS)}
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 0
        self.model_max_length = 4096
        self.prepend_bos = prepend_bos

    def _encode(self, text):
        ids = []
        i = 0
        while i < len(text):
            for s in self.SPECIALS:
                if text.startswith(s, i):
                    ids.append(self.vocab[s])
                    i += len(s)
                    break
            else:
                ids.append(3 + ord(text[i]) % 900)
                i += 1
        return ids

    def __call__(self, text, **kw):
        ids = self._encode(text)
        if self.prepend_bos:
            ids = [self.bos_token_id] + ids
        return FakeTokens(ids)

    def decode(self, ids, skip_special_tokens=False):
        inv = {v: k for k, v in self.vocab.items()}
        out = []
        for t in ids:
            t = int(t)
            if t in (self.bos_token_id, self.eos_token_id, self.pad_token_id):
                if not skip_special_tokens:
                    out.append(f"<{t}>")
            elif t in inv:
                if not skip_special_tokens:
                    out.append(inv[t])
            else:
                out.append(chr((t - 3) % 900))
        return "".join(out)


def test_tokenizer_image_token_dedups_bos():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("hi<image>yo", tok)
    # one bos, then 'hi', -200, 'yo'
    assert ids[0] == tok.bos_token_id
    assert ids.count(tok.bos_token_id) == 1
    assert IMAGE_TOKEN_INDEX in ids
    assert len(ids) == 1 + 2 + 1 + 2


def _source(q, a, q2=None, a2=None):
    conv = [{"from": "human", "value": q}, {"from": "gpt", "value": a}]
    if q2:
        conv += [{"from": "human", "value": q2}, {"from": "gpt", "value": a2}]
    return [conv]


def _unmasked_ids(ids, labels):
    return [int(t) for t, l in zip(ids, labels) if l != IGNORE_INDEX]


def test_preprocess_v1_masks_only_responses():
    tok = FakeTokenizer()
    templates.set_default_template("v1")
    out = templates.preprocess_v1(
        _source("<image> what is left?", "the box", "and right?", "the cat"),
        tok,
        has_image=True,
        strict=False,  # fake tokenizer lacks llama SP quirks; see templates.py
    )
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labels)
    un = _unmasked_ids(ids, labels)
    # supervised tokens = answers + sep2 tokens; must contain both answers
    a1 = tok._encode("the box")
    a2 = tok._encode("the cat")
    flat = un
    s1 = "".join(map(str, a1))
    s2 = "".join(map(str, a2))
    joined = "".join(map(str, flat))
    assert s1 in joined and s2 in joined
    # nothing from the question is supervised
    q = tok._encode("what is left?")
    assert "".join(map(str, q)) not in joined


def test_preprocess_llama3_masks_only_responses():
    tok = FakeTokenizer(prepend_bos=False)  # llama3 template carries its own leading token
    templates.set_default_template("llama_3")
    out = templates.preprocess_llama_3(
        _source("<image> where?", "on the left", "sure?", "yes"),
        tok,
        has_image=True,
        strict=False,
    )
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[0] == tok.bos_token_id  # bos fix-up applied
    joined = "".join(map(str, _unmasked_ids(ids, labels)))
    assert "".join(map(str, tok._encode("on the left<|eot_id|>"))) in joined
    assert "".join(map(str, tok._encode("yes"))) in joined
    assert "".join(map(str, tok._encode("where?"))) not in joined
    # no tokenization-mismatch fallback (all-IGNORE) occurred
    assert any(l != IGNORE_INDEX for l in labels)


def test_preprocess_plain():
    tok = FakeTokenizer()
    templates.set_default_template("plain")
    out = templates.preprocess(
        [[{"from": "human", "value": "<image> ignore"}, {"from": "gpt", "value": "a red car"}]],
        tok,
        has_image=True,
    )
    ids, labels = out["input_ids"][0], out["labels"][0]
    joined = "".join(map(str, _unmasked_ids(ids, labels)))
    assert "".join(map(str, tok._encode("a red car\n"))) in joined
    assert IMAGE_TOKEN_INDEX in ids.tolist()
    # image part fully masked
    img_pos = ids.tolist().index(IMAGE_TOKEN_INDEX)
    assert all(l == IGNORE_INDEX for l in labels[: img_pos + 1])


def teardown_module():
    templates.set_default_template("v1")
