"""OWL-ViT open-vocabulary detector, TPU-native.

The reference osdsynth pipeline grounds RAM's tag list with GroundingDINO
(dataset_pipeline/osdsynth/processor/wrappers/grounding_dino.py:18-28,
``Model.predict_with_classes`` in segment.py:66-71).  GroundingDINO's
multi-scale deformable attention is gather-heavy and maps poorly onto the
MXU; the TPU-native equivalent of "text-conditioned open-vocab box
proposals" is the OWL-ViT architecture — a CLIP ViT whose patch tokens
each predict one box (grid-biased cxcywh head) and a class logit per text
query (cosine similarity with learned shift/scale).  Pure attention +
matmul, weight-compatible with HF ``OwlViTForObjectDetection``
checkpoints (convert_owlvit; parity in tests/test_owl_vit.py).

``make_detector`` reproduces the GroundingDINO wrapper contract used by
the synth SegmentStage: ``detector(image, classes) -> [(label, xyxy,
score)]`` with a box_threshold, per-patch argmax over class queries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.layers import gelu_erf, layer_norm, linear

Params = Dict


@dataclass(frozen=True)
class OwlViTVisionConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 768
    patch_size: int = 32
    layer_norm_eps: float = 1e-5

    @property
    def num_patches_side(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class OwlViTTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    max_position_embeddings: int = 16
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class OwlViTConfig:
    vision: OwlViTVisionConfig = OwlViTVisionConfig()
    text: OwlViTTextConfig = OwlViTTextConfig()
    projection_dim: int = 512


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _mha(x, p, num_heads, bias=None):
    """Standard MHA over (B, T, C); ``bias`` is an additive (B|1, 1|H, T, T)."""
    B, T, C = x.shape
    d = C // num_heads
    q = linear(x, p["q"]).reshape(B, T, num_heads, d).transpose(0, 2, 1, 3)
    k = linear(x, p["k"]).reshape(B, T, num_heads, d).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]).reshape(B, T, num_heads, d).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (d**-0.5)
    if bias is not None:
        s = s + bias
    pr = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", pr, v).transpose(0, 2, 1, 3).reshape(B, T, C)
    return linear(o, p["proj"])


def _clip_layer(x, p, num_heads, eps, bias=None):
    x = x + _mha(layer_norm(x, p["ln1"], eps), p["attn"], num_heads, bias)
    h = layer_norm(x, p["ln2"], eps)
    return x + linear(quick_gelu(linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------


def encode_image(params: Params, pixel_values: jax.Array, cfg: OwlViTConfig) -> jax.Array:
    """pixel_values (B, S, S, 3) -> merged patch features (B, P, width)
    (CLS-token-modulated grid, post-LN — modeling_owlvit image_embedder)."""
    v = cfg.vision
    p = params["vision"]
    k = p["patch_embed"]["kernel"]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(k.dtype), k,
        window_strides=(v.patch_size, v.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, -1, v.hidden_size)
    cls = jnp.broadcast_to(p["class_embed"].astype(x.dtype)[None, None], (B, 1, v.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"][None].astype(x.dtype)
    x = layer_norm(x, p["pre_ln"], v.layer_norm_eps)
    for lp in p["layers"]:
        x = _clip_layer(x, lp, v.num_attention_heads, v.layer_norm_eps)
    x = layer_norm(x, p["post_ln"], v.layer_norm_eps)
    # merge class token into every patch, then the detection LN
    feats = x[:, 1:] * x[:, :1]
    return layer_norm(feats, params["merged_ln"], v.layer_norm_eps)


def encode_text(params: Params, input_ids: jax.Array, attention_mask: jax.Array, cfg: OwlViTConfig) -> jax.Array:
    """(Q, T) ids + mask -> normalized projected query embeds (Q, proj)."""
    t = cfg.text
    p = params["text"]
    Q, T = input_ids.shape
    x = jnp.take(p["token_embed"], input_ids, axis=0) + p["pos_embed"][None, :T]
    causal = jnp.where(
        jnp.arange(T)[:, None] >= jnp.arange(T)[None, :], 0.0, jnp.finfo(jnp.float32).min
    )
    pad = jnp.where(attention_mask[:, None, None, :] != 0, 0.0, jnp.finfo(jnp.float32).min)
    bias = causal[None, None] + pad
    for lp in p["layers"]:
        x = _clip_layer(x, lp, t.num_attention_heads, t.layer_norm_eps, bias)
    x = layer_norm(x, p["final_ln"], t.layer_norm_eps)
    pooled = x[jnp.arange(Q), jnp.argmax(input_ids, axis=-1)]
    emb = linear(pooled, params["text_projection"])
    return emb / (jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)).astype(emb.dtype)


# ---------------------------------------------------------------------------
# Detection heads
# ---------------------------------------------------------------------------


def box_bias(side: int) -> np.ndarray:
    """(P, 4) grid logit bias (modeling_owlvit compute_box_bias)."""
    coords = np.stack(
        np.meshgrid(np.arange(1, side + 1), np.arange(1, side + 1), indexing="xy"), axis=-1
    ).astype(np.float32)
    coords /= side
    coords = np.clip(coords.reshape(-1, 2), 0.0, 1.0)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    size = np.full_like(coord_bias, 1.0 / side)
    size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
    return np.concatenate([coord_bias, size_bias], axis=-1)


def predict_boxes(params: Params, image_feats: jax.Array, cfg: OwlViTConfig) -> jax.Array:
    """-> (B, P, 4) cxcywh in [0, 1].  The box head uses exact (erf) GELU
    (modeling_owlvit OwlViTBoxPredictionHead hardcodes nn.GELU), unlike
    the towers' quick_gelu."""
    h = gelu_erf(linear(image_feats, params["box_head"]["dense0"]))
    h = gelu_erf(linear(h, params["box_head"]["dense1"]))
    h = linear(h, params["box_head"]["dense2"])
    return jax.nn.sigmoid(h + jnp.asarray(box_bias(cfg.vision.num_patches_side))[None])


def predict_classes(
    params: Params,
    image_feats: jax.Array,  # (B, P, width)
    query_embeds: jax.Array,  # (Q, proj) normalized
    query_mask: Optional[jax.Array] = None,  # (Q,) bool
) -> jax.Array:
    """-> (B, P, Q) logits (cosine sim with learned shift/scale)."""
    img = linear(image_feats, params["class_head"]["dense0"])
    img = img / (jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6).astype(img.dtype)
    qe = query_embeds / (
        jnp.linalg.norm(query_embeds.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6
    ).astype(query_embeds.dtype)
    logits = jnp.einsum("bpd,qd->bpq", img, qe, preferred_element_type=jnp.float32)
    shift = linear(image_feats, params["class_head"]["logit_shift"]).astype(jnp.float32)
    scale = jax.nn.elu(linear(image_feats, params["class_head"]["logit_scale"]).astype(jnp.float32)) + 1.0
    logits = (logits + shift) * scale
    if query_mask is not None:
        logits = jnp.where(query_mask[None, None, :], logits, jnp.finfo(jnp.float32).min)
    return logits


def detect(
    params: Params,
    cfg: OwlViTConfig,
    pixel_values: jax.Array,  # (B, S, S, 3)
    input_ids: jax.Array,  # (Q, T)
    attention_mask: jax.Array,  # (Q, T)
) -> Tuple[jax.Array, jax.Array]:
    """Full forward: -> (pred_logits (B, P, Q), pred_boxes (B, P, 4))."""
    feats = encode_image(params, pixel_values, cfg)
    queries = encode_text(params, input_ids, attention_mask, cfg)
    logits = predict_classes(params, feats, queries, query_mask=input_ids[:, 0] > 0)
    boxes = predict_boxes(params, feats, cfg)
    return logits, boxes


# ---------------------------------------------------------------------------
# Detector wrapper (GroundingDINO predict_with_classes contract)
# ---------------------------------------------------------------------------

OWLVIT_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OWLVIT_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(image: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * (255.0 if img.max() <= 1.5 else 1.0), 0, 255).astype(np.uint8)
    img = np.asarray(Image.fromarray(img).resize((size, size), Image.BICUBIC), np.float32)
    return (img / 255.0 - OWLVIT_MEAN) / OWLVIT_STD


def make_detector(
    params: Params,
    cfg: OwlViTConfig,
    tokenize: Callable[[List[str]], Tuple[np.ndarray, np.ndarray]],
    box_threshold: float = 0.25,
    max_queries: int = 32,
    prompt: str = "a photo of a {}",
) -> Callable[[np.ndarray, Sequence[str]], List[Tuple[str, np.ndarray, float]]]:
    """Build ``detector(image, classes) -> [(label, xyxy, score)]`` for
    synth.SegmentStage (the reference's predict_with_classes contract,
    segment.py:66-71): per patch, class = argmax over queries, score =
    sigmoid(max logit), keep score > box_threshold.

    ``tokenize`` maps prompt strings to (ids (Q, T), mask (Q, T)) — the
    CLIP BPE from a checkpoint dir, or any injected stand-in.  Queries
    are padded to ``max_queries`` so recompiles don't scale with the tag
    count.
    """
    fwd = jax.jit(lambda p, x, ids, m: detect(p, cfg, x, ids, m))

    def detector(image: np.ndarray, classes: Sequence[str]):
        if not classes:
            return []
        classes = list(classes)[:max_queries]
        ids, mask = tokenize([prompt.format(c) for c in classes])
        T = ids.shape[1]
        padq = max_queries - ids.shape[0]
        ids = np.pad(ids, ((0, padq), (0, 0)))
        mask = np.pad(mask, ((0, padq), (0, 0)))
        x = preprocess_image(image, cfg.vision.image_size)[None]
        logits, boxes = fwd(params, jnp.asarray(x), jnp.asarray(ids), jnp.asarray(mask))
        logits = np.asarray(logits)[0]  # (P, Q)
        boxes = np.asarray(boxes)[0]  # (P, 4) cxcywh
        probs = 1.0 / (1.0 + np.exp(-logits))
        best = probs.argmax(axis=-1)
        score = probs.max(axis=-1)
        H, W = np.asarray(image).shape[:2]
        out = []
        for pi in np.nonzero(score > box_threshold)[0]:
            ci = int(best[pi])
            if ci >= len(classes):
                continue
            cx, cy, w, h = boxes[pi]
            xyxy = np.array(
                [(cx - w / 2) * W, (cy - h / 2) * H, (cx + w / 2) * W, (cy + h / 2) * H],
                np.float32,
            )
            xyxy = np.clip(xyxy, 0, [W, H, W, H])
            out.append((classes[ci], xyxy, float(score[pi])))
        return out

    return detector


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: OwlViTConfig, dtype=jnp.float32) -> Params:
    keys = iter(
        jax.random.split(
            rng, 16 + 10 * (cfg.vision.num_hidden_layers + cfg.text.num_hidden_layers)
        )
    )

    def dense(fi, fo, bias=True):
        p = {"kernel": jax.random.normal(next(keys), (fi, fo), dtype) * (fi**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((fo,), dtype)
        return p

    def ln(n):
        return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    def clip_layers(n_layers, C, I):
        return [
            {
                "ln1": ln(C),
                "attn": {"q": dense(C, C), "k": dense(C, C), "v": dense(C, C), "proj": dense(C, C)},
                "ln2": ln(C),
                "mlp": {"fc1": dense(C, I), "fc2": dense(I, C)},
            }
            for _ in range(n_layers)
        ]

    v, t = cfg.vision, cfg.text
    P = v.patch_size
    n_pos = v.num_patches_side**2 + 1
    return {
        "vision": {
            "patch_embed": {"kernel": jax.random.normal(next(keys), (P, P, 3, v.hidden_size), dtype) * 0.02},
            "class_embed": jax.random.normal(next(keys), (v.hidden_size,), dtype) * 0.02,
            "pos_embed": jax.random.normal(next(keys), (n_pos, v.hidden_size), dtype) * 0.02,
            "pre_ln": ln(v.hidden_size),
            "layers": clip_layers(v.num_hidden_layers, v.hidden_size, v.intermediate_size),
            "post_ln": ln(v.hidden_size),
        },
        "text": {
            "token_embed": jax.random.normal(next(keys), (t.vocab_size, t.hidden_size), dtype) * 0.02,
            "pos_embed": jax.random.normal(next(keys), (t.max_position_embeddings, t.hidden_size), dtype) * 0.02,
            "layers": clip_layers(t.num_hidden_layers, t.hidden_size, t.intermediate_size),
            "final_ln": ln(t.hidden_size),
        },
        "text_projection": dense(t.hidden_size, cfg.projection_dim, bias=False),
        "merged_ln": ln(v.hidden_size),
        "class_head": {
            "dense0": dense(v.hidden_size, t.hidden_size),
            "logit_shift": dense(v.hidden_size, 1),
            "logit_scale": dense(v.hidden_size, 1),
        },
        "box_head": {
            "dense0": dense(v.hidden_size, v.hidden_size),
            "dense1": dense(v.hidden_size, v.hidden_size),
            "dense2": dense(v.hidden_size, 4),
        },
    }


def _np(x):
    return x.detach().cpu().numpy()


def convert_owlvit(sd, cfg: OwlViTConfig, dtype=jnp.float32) -> Params:
    """HF ``OwlViTForObjectDetection`` state dict -> param pytree."""

    def dense(name, bias=True):
        p = {"kernel": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
        if bias and name + ".bias" in sd:
            p["bias"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
        return p

    def ln(name):
        return {
            "scale": jnp.asarray(_np(sd[name + ".weight"]), dtype),
            "bias": jnp.asarray(_np(sd[name + ".bias"]), dtype),
        }

    def clip_layers(prefix, n):
        out = []
        for i in range(n):
            b = f"{prefix}.layers.{i}."
            out.append(
                {
                    "ln1": ln(b + "layer_norm1"),
                    "attn": {
                        "q": dense(b + "self_attn.q_proj"),
                        "k": dense(b + "self_attn.k_proj"),
                        "v": dense(b + "self_attn.v_proj"),
                        "proj": dense(b + "self_attn.out_proj"),
                    },
                    "ln2": ln(b + "layer_norm2"),
                    "mlp": {"fc1": dense(b + "mlp.fc1"), "fc2": dense(b + "mlp.fc2")},
                }
            )
        return out

    vm = "owlvit.vision_model."
    tm = "owlvit.text_model."
    return {
        "vision": {
            "patch_embed": {
                "kernel": jnp.asarray(
                    _np(sd[vm + "embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0), dtype
                )
            },
            "class_embed": jnp.asarray(_np(sd[vm + "embeddings.class_embedding"]), dtype),
            "pos_embed": jnp.asarray(_np(sd[vm + "embeddings.position_embedding.weight"]), dtype),
            "pre_ln": ln(vm + "pre_layernorm"),
            "layers": clip_layers(vm + "encoder", cfg.vision.num_hidden_layers),
            "post_ln": ln(vm + "post_layernorm"),
        },
        "text": {
            "token_embed": jnp.asarray(_np(sd[tm + "embeddings.token_embedding.weight"]), dtype),
            "pos_embed": jnp.asarray(_np(sd[tm + "embeddings.position_embedding.weight"]), dtype),
            "layers": clip_layers(tm + "encoder", cfg.text.num_hidden_layers),
            "final_ln": ln(tm + "final_layer_norm"),
        },
        "text_projection": dense("owlvit.text_projection", bias=False),
        "merged_ln": ln("layer_norm"),
        "class_head": {
            "dense0": dense("class_head.dense0"),
            "logit_shift": dense("class_head.logit_shift"),
            "logit_scale": dense("class_head.logit_scale"),
        },
        "box_head": {
            "dense0": dense("box_head.dense0"),
            "dense1": dense("box_head.dense1"),
            "dense2": dense("box_head.dense2"),
        },
    }
