"""RAM-style open-set image tagger (recognize-anything equivalent).

The reference osdsynth pipeline opens every image with RAM
(``ram(pretrained=..., image_size=384, vit="swin_l")``,
dataset_pipeline/osdsynth/processor/wrappers/ram.py:49-56) to produce the
class list that GroundingDINO grounds.  This is the TPU-native
equivalent: the Swin-L backbone (models/swin.py) + a Q2L-style tagging
head — per-tag query embeddings run through a small decoder
(self-attention over queries, cross-attention into the image tokens,
FFN), then a group-wise linear produces one binary logit per tag; a tag
fires when sigmoid(logit) exceeds its per-class threshold (RAM's
class-threshold semantics, default 0.68).

``run_tagging_model``'s tag post-processing (add/remove classes,
substring-based removal, background filtering — reference ram.py:11-46)
is reproduced verbatim in ``process_tag_classes`` / ``make_tagger``.

Converter note: the released ram_swin_large_14m.pth cannot be fetched in
this environment; ``convert_ram`` pins the Swin backbone names (HF Swin
layout via models/swin.convert_swin) and documents the head mapping to
be validated against a real weight file.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.models import swin as swin_mod
from spatialrgpt_tpu.ops.layers import gelu_erf, layer_norm, linear

Params = Dict

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)  # ram.py:60 transform
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class RamConfig:
    swin: swin_mod.SwinConfig = swin_mod.SWIN_L_384
    num_tags: int = 4585  # RAM tag vocabulary size
    hidden_size: int = 768  # tagging-head width
    num_decoder_layers: int = 2
    num_heads: int = 4
    default_threshold: float = 0.68
    layer_norm_eps: float = 1e-12


def _mha(q_in, kv_in, p, num_heads):
    Bq, Tq, C = q_in.shape
    Tk = kv_in.shape[1]
    d = C // num_heads
    q = linear(q_in, p["q"]).reshape(Bq, Tq, num_heads, d).transpose(0, 2, 1, 3)
    k = linear(kv_in, p["k"]).reshape(Bq, Tk, num_heads, d).transpose(0, 2, 1, 3)
    v = linear(kv_in, p["v"]).reshape(Bq, Tk, num_heads, d).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (d**-0.5)
    pr = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, v).transpose(0, 2, 1, 3).reshape(Bq, Tq, C)
    return linear(o, p["proj"])


def forward(params: Params, pixel_values: jax.Array, cfg: RamConfig) -> jax.Array:
    """pixel_values (B, S, S, 3) normalized -> per-tag logits (B, num_tags)."""
    feats = swin_mod.forward(params["swin"], pixel_values, cfg.swin)  # (B, L, F)
    feats = linear(feats, params["vision_proj"])  # (B, L, D)
    B = feats.shape[0]
    q = jnp.broadcast_to(
        params["tag_embed"].astype(feats.dtype)[None],
        (B,) + params["tag_embed"].shape,
    )  # (B, num_tags, D)
    for lp in params["decoder"]:
        q = q + _mha(layer_norm(q, lp["ln_self"], cfg.layer_norm_eps), layer_norm(q, lp["ln_self"], cfg.layer_norm_eps), lp["self_attn"], cfg.num_heads)
        q = q + _mha(layer_norm(q, lp["ln_cross"], cfg.layer_norm_eps), feats, lp["cross_attn"], cfg.num_heads)
        h = layer_norm(q, lp["ln_mlp"], cfg.layer_norm_eps)
        q = q + linear(gelu_erf(linear(h, lp["mlp"]["fc1"])), lp["mlp"]["fc2"])
    q = layer_norm(q, params["final_norm"], cfg.layer_norm_eps)
    # group-wise linear: one weight vector + bias per tag
    logits = jnp.einsum("bnd,nd->bn", q.astype(jnp.float32), params["fc_w"].astype(jnp.float32))
    return logits + params["fc_b"].astype(jnp.float32)


def init_params(rng: jax.Array, cfg: RamConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 16 + 12 * cfg.num_decoder_layers))

    def dense(fi, fo):
        return {
            "kernel": jax.random.normal(next(keys), (fi, fo), dtype) * (fi**-0.5),
            "bias": jnp.zeros((fo,), dtype),
        }

    def ln(n):
        return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    D = cfg.hidden_size
    layers = []
    for _ in range(cfg.num_decoder_layers):
        layers.append(
            {
                "ln_self": ln(D),
                "self_attn": {"q": dense(D, D), "k": dense(D, D), "v": dense(D, D), "proj": dense(D, D)},
                "ln_cross": ln(D),
                "cross_attn": {"q": dense(D, D), "k": dense(D, D), "v": dense(D, D), "proj": dense(D, D)},
                "ln_mlp": ln(D),
                "mlp": {"fc1": dense(D, 4 * D), "fc2": dense(4 * D, D)},
            }
        )
    return {
        "swin": swin_mod.init_params(next(keys), cfg.swin, dtype),
        "vision_proj": dense(cfg.swin.num_features, D),
        "tag_embed": jax.random.normal(next(keys), (cfg.num_tags, D), dtype) * 0.02,
        "decoder": layers,
        "final_norm": ln(D),
        "fc_w": jax.random.normal(next(keys), (cfg.num_tags, D), dtype) * (D**-0.5),
        "fc_b": jnp.zeros((cfg.num_tags,), dtype),
    }


# ---------------------------------------------------------------------------
# Tag post-processing (reference wrappers/ram.py semantics)
# ---------------------------------------------------------------------------


def process_tag_classes(
    tags: Sequence[str],
    add_classes: Sequence[str] = (),
    remove_classes: Sequence[str] = (),
) -> List[str]:
    """Reference ``process_tag_classes`` (wrappers/ram.py:34-46): strip,
    drop empties, append missing add_classes, remove by substring match."""
    classes = [c.strip() for c in tags]
    classes = [c for c in classes if c != ""]
    for c in add_classes:
        if c not in classes:
            classes.append(c)
    for c in remove_classes:
        classes = [obj for obj in classes if c not in obj.lower()]
    return classes


def preprocess_image(image: np.ndarray, size: int = 384) -> np.ndarray:
    """uint8/float RGB (H, W, 3) -> normalized (size, size, 3) float32
    (resize + ImageNet normalize, reference ram.py:58-63)."""
    from PIL import Image

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * (255.0 if img.max() <= 1.5 else 1.0), 0, 255).astype(np.uint8)
    img = np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR), np.float32)
    img = img / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def make_tagger(
    params: Params,
    cfg: RamConfig,
    tag_list: Sequence[str],
    thresholds: Optional[np.ndarray] = None,
    add_classes: Sequence[str] = (),
    remove_classes: Sequence[str] = (),
    bg_classes: Sequence[str] = (),
    rm_bg_classes: bool = True,
) -> Callable[[np.ndarray], List[str]]:
    """Build a ``tagger(image) -> [class names]`` for synth.SegmentStage,
    reproducing run_tagging_model (wrappers/ram.py:11-31): threshold per
    tag, then add/remove post-processing (bg classes removed by default)."""
    assert len(tag_list) == cfg.num_tags
    th = np.full((cfg.num_tags,), cfg.default_threshold, np.float32) if thresholds is None else np.asarray(thresholds, np.float32)
    removes = list(remove_classes) + (list(bg_classes) if rm_bg_classes else [])
    fwd = jax.jit(lambda p, x: forward(p, x, cfg))

    def tagger(image: np.ndarray) -> List[str]:
        x = preprocess_image(image, cfg.swin.image_size)[None]
        logits = np.asarray(fwd(params, jnp.asarray(x)))[0]
        probs = 1.0 / (1.0 + np.exp(-logits))
        fired = [tag_list[i] for i in range(cfg.num_tags) if probs[i] >= th[i]]
        return process_tag_classes(fired, add_classes=add_classes, remove_classes=removes)

    return tagger


def convert_ram(sd, cfg: RamConfig, dtype=jnp.float32) -> Params:
    """Released-checkpoint converter skeleton: the Swin backbone maps via
    models/swin.convert_swin once keys are renamed to the HF layout; the
    head tensors (label_embed / wordvec_proj / tagging_head / fc) must be
    pinned against a real ram_swin_large_14m.pth (unavailable offline —
    COMPONENTS.md known gaps)."""
    raise NotImplementedError(
        "RAM released-weight conversion requires the checkpoint file to pin names; "
        "architecture + tagger behavior are tested with random weights"
    )
