"""RADIO vision tower: processor + spec parsing + ViT-H/16+CPE backbone.

Rebuild of the reference's RADIO integration
(llava/model/multimodal_encoder/radio_encoder.py:27-318 + the 546-LoC
image_processor.py + radio_torchhub_encoder.py): the
``radio:<resolution>:<checkpoint>:<k=v,...>`` spec string, the
longest-edge-resize + bottom/right-pad processor, and the backbone the
released checkpoints contain — a timm-layout ViT-H/16 whose patch
generator carries RADIO's Cropped Positional Embedding (CPE): a learned
position table at the maximum training grid, bilinearly resampled to
each input's patch grid (that is what makes arbitrary ``pad_multiple``
resolutions work without the pos-embed resize dance of the HF towers;
at inference CPE reduces to deterministic interpolation).

Feature selects mirror ``radio_encoder.py``:
  - ``patch``      -> (B, T, 1280) patch tokens (default)
  - ``cls``        -> (B, 1, 5120) the 4 summary tokens concatenated
  - ``cls4``       -> (B, 4, 1280) summary tokens as 4 tokens
  - ``dense``      -> (B, T, 5120): quarter-depth block-group averages
                      concatenated with the final normed features
                      (radio_encoder.py get_features "dense" branch)

Weight conversion (``convert_radio_state_dict``) maps the released
checkpoints' timm key layout; it is shape-checked here and will be
validated the moment real weights land (offline environment — README
lists the requested artifact).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from spatialrgpt_tpu.ops.layers import layer_norm, linear

Params = Dict


# ---------------------------------------------------------------------------
# Spec string (radio_encoder.py parses "radio:<res>:<name>:<extra,k=v>")
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RadioSpec:
    resolution: int
    checkpoint: str
    options: Tuple[Tuple[str, str], ...] = ()

    @property
    def options_dict(self) -> Dict[str, str]:
        return dict(self.options)


def parse_radio_spec(spec: str) -> RadioSpec:
    parts = spec.split(":")
    if parts[0] != "radio" or len(parts) < 3:
        raise ValueError(f"not a radio spec: {spec}")
    res = int(parts[1])
    ckpt = parts[2]
    opts = []
    if len(parts) > 3 and parts[3]:
        for kv in parts[3].split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                opts.append((k, v))
            else:
                opts.append((kv, "true"))
    return RadioSpec(resolution=res, checkpoint=ckpt, options=tuple(opts))


# ---------------------------------------------------------------------------
# Processor: longest-edge resize (round-half-up) + bottom/right pad
# ---------------------------------------------------------------------------


@dataclass
class RadioImageProcessor:
    longest_edge: int = 768
    pad_multiple: int = 16
    pad_value: float = 0.0
    do_normalize: bool = True
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    def get_preprocess_shape(self, h: int, w: int) -> Tuple[int, int]:
        """(image_processor.py:219-227: scale longest edge, round +0.5)."""
        scale = self.longest_edge / max(h, w)
        return int(h * scale + 0.5), int(w * scale + 0.5)

    def __call__(self, image) -> Dict[str, np.ndarray]:
        if isinstance(image, Image.Image):
            arr = np.asarray(image.convert("RGB"))
        else:
            arr = np.asarray(image)
        h, w = arr.shape[:2]
        nh, nw = self.get_preprocess_shape(h, w)
        img = np.asarray(
            Image.fromarray(arr.astype(np.uint8)).resize((nw, nh), Image.BICUBIC),
            np.float32,
        ) / 255.0
        if self.do_normalize:
            img = (img - np.asarray(self.image_mean)) / np.asarray(self.image_std)
        ph = -(-nh // self.pad_multiple) * self.pad_multiple
        pw = -(-nw // self.pad_multiple) * self.pad_multiple
        out = np.full((ph, pw, 3), self.pad_value, np.float32)
        out[:nh, :nw] = img  # bottom/right pad (image_processor.py:181-217)
        return {"pixel_values": out, "unpadded_size": (nh, nw)}


# ---------------------------------------------------------------------------
# Backbone: timm-layout ViT + CPE patch generator
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RadioBackboneConfig:
    hidden_size: int = 1280  # ViT-H
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    intermediate_size: int = 5120
    patch_size: int = 16
    num_cls_tokens: int = 4  # summary tokens (get_hidden_size: cls = 5120)
    num_registers: int = 0  # extra skip tokens (patch_gen.num_skip = cls + reg)
    cpe_grid: int = 64  # CPE table stored at (cpe_grid)^2 patches (1024 px / 16)
    layer_norm_eps: float = 1e-6
    summary_idxs: Optional[Tuple[int, ...]] = None  # radio_model.summary_idxs
    skip_layer_norm: bool = False  # spec option skip_layer_norm=True

    @property
    def num_skip(self) -> int:
        return self.num_cls_tokens + self.num_registers


def init_radio_params(
    rng: jax.Array, cfg: RadioBackboneConfig, dtype=jnp.float32
) -> Params:
    ks = jax.random.split(rng, 3 + cfg.num_hidden_layers)
    H, I = cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size

    def dense(key, fi, fo):
        return {
            "kernel": jax.random.normal(key, (fi, fo), dtype) * (fi**-0.5),
            "bias": jnp.zeros((fo,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)}

    layers = []
    for li in range(cfg.num_hidden_layers):
        kk = jax.random.split(ks[3 + li], 4)
        layers.append(
            {
                "ln1": ln(),
                "ln2": ln(),
                "attn": {"qkv": dense(kk[0], H, 3 * H), "proj": dense(kk[1], H, H)},
                "mlp": {"fc1": dense(kk[2], H, I), "fc2": dense(kk[3], I, H)},
            }
        )
    return {
        "patch_embed": dense(ks[0], P * P * 3, H),
        "cls_tokens": jax.random.normal(ks[1], (cfg.num_skip, H), dtype) * 0.02,
        "pos_embed": jax.random.normal(ks[2], (cfg.cpe_grid * cfg.cpe_grid, H), dtype)
        * 0.02,
        "layers": layers,
        "norm": ln(),
    }


def cpe_position_embed(
    pos_embed: jax.Array, cpe_grid: int, gh: int, gw: int
) -> jax.Array:
    """CPE at inference: bilinearly resample the (cpe_grid, cpe_grid)
    position table to the input's (gh, gw) patch grid (the deterministic
    limit of RADIO's train-time random-crop positional embedding)."""
    H = pos_embed.shape[-1]
    table = pos_embed.reshape(cpe_grid, cpe_grid, H).astype(jnp.float32)
    if (gh, gw) != (cpe_grid, cpe_grid):
        table = jax.image.resize(table, (gh, gw, H), method="bilinear")
    return table.reshape(gh * gw, H).astype(pos_embed.dtype)


def _radio_attention(x: jax.Array, p: Params, nh: int) -> jax.Array:
    B, T, H = x.shape
    d = H // nh
    qkv = linear(x, p["qkv"]).reshape(B, T, 3, nh, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * (d**-0.5)
    probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H)
    return linear(out, p["proj"])


def _radio_block(x: jax.Array, p: Params, cfg: RadioBackboneConfig) -> jax.Array:
    h = layer_norm(x, p["ln1"], eps=cfg.layer_norm_eps)
    x = x + _radio_attention(h, p["attn"], cfg.num_attention_heads)
    h = layer_norm(x, p["ln2"], eps=cfg.layer_norm_eps)
    h = linear(h, p["mlp"]["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    return x + linear(h, p["mlp"]["fc2"])


def _embed_tokens(params: Params, cfg: RadioBackboneConfig, pixels: jax.Array):
    """(B, H, W, 3) -> (B, num_skip + gh*gw, hidden): patchify + CPE +
    prepended summary/register tokens (RADIO's ViTPatchGenerator)."""
    B, Hpx, Wpx, _ = pixels.shape
    P = cfg.patch_size
    if Hpx % P or Wpx % P:
        raise ValueError(f"input {Hpx}x{Wpx} not a multiple of patch {P}")
    gh, gw = Hpx // P, Wpx // P
    patches = pixels.reshape(B, gh, P, gw, P, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, P * P * 3)
    x = linear(patches.astype(params["patch_embed"]["kernel"].dtype), params["patch_embed"])
    x = x + cpe_position_embed(params["pos_embed"], cfg.cpe_grid, gh, gw)[None]
    cls = jnp.broadcast_to(
        params["cls_tokens"][None], (B,) + params["cls_tokens"].shape
    ).astype(x.dtype)
    return jnp.concatenate([cls, x], axis=1)


def _split_summary(x: jax.Array, cfg: RadioBackboneConfig):
    """tokens -> (summary, patch features), radio_encoder.py
    _get_summary_and_patch_from_tokens (CPE patch-generator branch)."""
    all_summary = x[:, : cfg.num_cls_tokens]
    summary = (
        all_summary[:, list(cfg.summary_idxs)]
        if cfg.summary_idxs is not None
        else all_summary
    )
    return summary, x[:, cfg.num_skip :]


def radio_forward(
    params: Params, cfg: RadioBackboneConfig, pixels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Full backbone forward: (summary (B, n_cls, H), features (B, T, H))."""
    x = _embed_tokens(params, cfg, pixels)
    for lp in params["layers"]:
        x = _radio_block(x, lp, cfg)
    if not cfg.skip_layer_norm:
        x = layer_norm(x, params["norm"], eps=cfg.layer_norm_eps)
    return _split_summary(x, cfg)


def radio_forward_dense(
    params: Params, cfg: RadioBackboneConfig, pixels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """The "dense" select (radio_encoder.py get_features): average the
    patch features of each quarter-depth block group, concatenate the
    three quarter averages with the final normed features -> 4x hidden."""
    L = cfg.num_hidden_layers
    multilayers = {L // 4 - 1, L // 2 - 1, L // 4 * 3 - 1}
    x = _embed_tokens(params, cfg, pixels)
    groups = []
    acc = []
    for i, lp in enumerate(params["layers"]):
        x = _radio_block(x, lp, cfg)
        acc.append(_split_summary(x, cfg)[1])
        if i in multilayers:
            groups.append(sum(acc) / len(acc))
            acc = []
    if not cfg.skip_layer_norm:
        x = layer_norm(x, params["norm"], eps=cfg.layer_norm_eps)
    summary, last = _split_summary(x, cfg)
    groups.append(last)
    return summary, jnp.concatenate(groups, axis=-1)


def convert_radio_state_dict(
    sd: Dict[str, "np.ndarray"], cfg: RadioBackboneConfig, dtype=jnp.float32
) -> Params:
    """Map the released RADIO checkpoints' timm key layout into our
    pytree.  Keys follow timm VisionTransformer + RADIO's patch
    generator (radio_torchhub_encoder.py loads the same):

      model.patch_generator.embedder.weight      (H, 3*P*P) conv-as-linear
      model.patch_generator.cls_token.token      (1, n_cls, H)
      model.patch_generator.pos_embed            (1, G*G, H)
      model.blocks.{i}.norm1.{weight,bias}
      model.blocks.{i}.attn.qkv.{weight,bias}    (3H, H)
      model.blocks.{i}.attn.proj.{weight,bias}
      model.blocks.{i}.norm2.{weight,bias}
      model.blocks.{i}.mlp.fc1.{weight,bias}
      model.blocks.{i}.mlp.fc2.{weight,bias}
      model.norm.{weight,bias}

    Shape-checked against init_radio_params; numerical validation needs
    the released file (offline-blocked; listed in README's requested
    artifacts).
    """

    def t(name):  # torch Linear stores (out, in) -> ours (in, out)
        return jnp.asarray(np.asarray(sd[name]), dtype).T

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]), dtype)

    H = cfg.hidden_size
    emb = np.asarray(sd["model.patch_generator.embedder.weight"])
    if emb.ndim == 4:  # conv weight (H, 3, P, P) -> (P*P*3, H) patch layout
        # our patches flatten as (py, px, channel)
        emb = emb.transpose(2, 3, 1, 0).reshape(-1, H)
        patch_kernel = jnp.asarray(emb, dtype)
    else:  # already (H, 3*P*P) linear
        patch_kernel = jnp.asarray(
            emb.reshape(H, 3, cfg.patch_size, cfg.patch_size)
            .transpose(2, 3, 1, 0)
            .reshape(-1, H),
            dtype,
        )
    bias_name = "model.patch_generator.embedder.bias"
    patch_bias = (
        arr(bias_name) if bias_name in sd else jnp.zeros((H,), dtype)
    )
    params = {
        "patch_embed": {"kernel": patch_kernel, "bias": patch_bias},
        "cls_tokens": arr("model.patch_generator.cls_token.token").reshape(-1, H),
        "pos_embed": arr("model.patch_generator.pos_embed").reshape(-1, H),
        "norm": {
            "scale": arr("model.norm.weight"),
            "bias": arr("model.norm.bias"),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"model.blocks.{i}"
        params["layers"].append(
            {
                "ln1": {"scale": arr(f"{pre}.norm1.weight"), "bias": arr(f"{pre}.norm1.bias")},
                "ln2": {"scale": arr(f"{pre}.norm2.weight"), "bias": arr(f"{pre}.norm2.bias")},
                "attn": {
                    "qkv": {"kernel": t(f"{pre}.attn.qkv.weight"), "bias": arr(f"{pre}.attn.qkv.bias")},
                    "proj": {"kernel": t(f"{pre}.attn.proj.weight"), "bias": arr(f"{pre}.attn.proj.bias")},
                },
                "mlp": {
                    "fc1": {"kernel": t(f"{pre}.mlp.fc1.weight"), "bias": arr(f"{pre}.mlp.fc1.bias")},
                    "fc2": {"kernel": t(f"{pre}.mlp.fc2.weight"), "bias": arr(f"{pre}.mlp.fc2.bias")},
                },
            }
        )
    ref = init_radio_params(jax.random.PRNGKey(0), cfg, dtype)
    ref["layers"] = [ref_layer_template(cfg, dtype)] * cfg.num_hidden_layers
    _check_shapes(ref, params)
    return params


def ref_layer_template(cfg: RadioBackboneConfig, dtype=jnp.float32) -> Params:
    H, I = cfg.hidden_size, cfg.intermediate_size
    z = lambda *s: jnp.zeros(s, dtype)
    return {
        "ln1": {"scale": z(H), "bias": z(H)},
        "ln2": {"scale": z(H), "bias": z(H)},
        "attn": {
            "qkv": {"kernel": z(H, 3 * H), "bias": z(3 * H)},
            "proj": {"kernel": z(H, H), "bias": z(H)},
        },
        "mlp": {
            "fc1": {"kernel": z(H, I), "bias": z(I)},
            "fc2": {"kernel": z(I, H), "bias": z(H)},
        },
    }


def _check_shapes(ref: Params, got: Params, path: str = "") -> None:
    if isinstance(ref, dict):
        for k in ref:
            if k not in got:
                raise ValueError(f"missing param {path}/{k}")
            _check_shapes(ref[k], got[k], f"{path}/{k}")
    elif isinstance(ref, list):
        for i, (r, g) in enumerate(zip(ref, got)):
            _check_shapes(r, g, f"{path}[{i}]")
    else:
        if ref.shape != got.shape:
            raise ValueError(f"shape mismatch at {path}: {got.shape} != {ref.shape}")


# ---------------------------------------------------------------------------
# Tower
# ---------------------------------------------------------------------------


class RadioVisionTower:
    """The reference tower interface over the backbone above: spec
    parsing, processor, feature select, hidden-size contract
    (radio_encoder.py get_hidden_size: cls/dense -> 4x hidden).

    Constructed self-contained (random weights offline; feed
    ``convert_radio_state_dict`` output when the released checkpoint
    lands).  ``backbone=`` still accepts an injected callable for tests
    or externally converted models."""

    def __init__(
        self,
        spec: str,
        backbone=None,
        params: Optional[Params] = None,
        backbone_cfg: Optional[RadioBackboneConfig] = None,
        select_feature: str = "patch",
        rng: Optional[jax.Array] = None,
    ):
        self.spec = parse_radio_spec(spec)
        self.processor = RadioImageProcessor(longest_edge=self.spec.resolution)
        opts = self.spec.options_dict
        skip_ln = opts.get("skip_layer_norm", "False").lower() in ("true", "1")
        self.cfg = backbone_cfg or RadioBackboneConfig(skip_layer_norm=skip_ln)
        if backbone_cfg is None and skip_ln:
            self.cfg = RadioBackboneConfig(skip_layer_norm=True)
        self.select_feature = select_feature
        self._injected = backbone
        if backbone is None:
            self.params = (
                params
                if params is not None
                else init_radio_params(rng or jax.random.PRNGKey(0), self.cfg)
            )
            fwd = radio_forward_dense if select_feature == "dense" else radio_forward
            self._fwd = jax.jit(lambda px: fwd(self.params, self.cfg, px))

    @property
    def hidden_size(self) -> int:
        if self.select_feature in ("cls", "dense"):
            return 4 * self.cfg.hidden_size  # radio_encoder.py:92-99
        return self.cfg.hidden_size

    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> features per select_feature (see module doc)."""
        if self._injected is not None:
            return self._injected(pixel_values)
        summary, features = self._fwd(pixel_values)
        B = pixel_values.shape[0]
        if self.select_feature == "cls":
            return summary.reshape(B, 1, -1)
        if self.select_feature == "cls4":
            return summary.reshape(B, self.cfg.num_cls_tokens, -1)
        if self.select_feature in ("patch", "dense"):
            return features
        raise ValueError(f"unknown select_feature {self.select_feature}")
