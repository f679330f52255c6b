"""Composite model configuration.

Mirrors the reference's composite ``LlavaConfig`` contract
(llava/model/configuration_llava.py:4-59): one top-level config holding
per-module sub-configs (llm / vision tower / mm projector / region extractor)
plus the multimodal wiring flags.  All configs are frozen dataclasses so they
hash and can be passed as static arguments to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


@dataclass(frozen=True)
class SiglipVisionConfig:
    """SigLIP ViT configuration (google/siglip-so400m-patch14-384 defaults)."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"
    # Feature selection contract (reference vision_encoder.py:21-34):
    # select_layer indexes HF hidden_states (embeddings + one entry per layer);
    # -2 == output of layer (num_hidden_layers - 1).  select_feature
    # 'cls_patch' keeps all tokens, 'patch' drops token 0.
    select_layer: int = -2
    select_feature: str = "cls_patch"

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side**2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class LlamaConfig:
    """Decoder configuration for the Llama family and its relatives
    (Mistral = sliding window; Gemma = gelu MLP + (1+w) norms + scaled
    embeddings + tied head; Mixtral = Mistral + MoE).  Field meanings are
    HF-compatible so checkpoints convert mechanically."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # Linear RoPE scaling factor (reference language_model/builder.py:31-38):
    # applied when model_max_length > max_position_embeddings.
    rope_scaling_factor: Optional[float] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    bos_token_id: int = 1
    eos_token_id: int = 128009
    # family knobs
    hidden_act: str = "silu"  # silu (llama/mistral) | gelu_tanh (gemma)
    sliding_window: Optional[int] = None  # mistral/mixtral
    norm_plus_one: bool = False  # gemma RMSNorm uses (1 + weight)
    scale_embeddings: bool = False  # gemma multiplies embeds by sqrt(hidden)
    explicit_head_dim: Optional[int] = None  # gemma fixes head_dim=256
    # MoE (mixtral); experts run densely like the reference
    # (modeling_mixtral_long_context.py top-2 routing executed densely)
    num_experts: int = 0
    num_experts_per_tok: int = 2
    router_aux_loss_coef: float = 0.02
    # "dense" mirrors the reference; "sparse" routes top-k tokens through
    # a grouped GEMM (lax.ragged_dot) at top_k/E of the dense FLOPs
    # (models/llama.py::_moe_block_sparse; requires stacked expert params)
    moe_impl: str = "dense"

    @property
    def head_dim(self) -> int:
        return self.explicit_head_dim or self.hidden_size // self.num_attention_heads

    @property
    def num_query_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0


# Named decoder presets for the model families the reference ships
# (SURVEY.md S2.4).
LLAMA_PRESETS = {
    # princeton-nlp/Sheared-LLaMA-2.7B
    "sheared-3b": LlamaConfig(
        vocab_size=32000,
        hidden_size=2560,
        intermediate_size=6912,
        num_hidden_layers=32,
        num_attention_heads=20,
        num_key_value_heads=20,
        max_position_embeddings=4096,
        rope_theta=10000.0,
        eos_token_id=2,
    ),
    "llama2-7b": LlamaConfig(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=32,
        max_position_embeddings=4096,
        rope_theta=10000.0,
        eos_token_id=2,
    ),
    "mistral-7b": LlamaConfig(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        max_position_embeddings=32768,
        rope_theta=10000.0,
        sliding_window=4096,
        eos_token_id=2,
    ),
    "mixtral-8x7b": LlamaConfig(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        max_position_embeddings=32768,
        rope_theta=1e6,
        sliding_window=None,
        num_experts=8,
        num_experts_per_tok=2,
        eos_token_id=2,
    ),
    "gemma-7b": LlamaConfig(
        vocab_size=256000,
        hidden_size=3072,
        intermediate_size=24576,
        num_hidden_layers=28,
        num_attention_heads=16,
        num_key_value_heads=16,
        max_position_embeddings=8192,
        rope_theta=10000.0,
        hidden_act="gelu_tanh",
        norm_plus_one=True,
        scale_embeddings=True,
        explicit_head_dim=256,
        tie_word_embeddings=True,
        rms_norm_eps=1e-6,
        bos_token_id=2,
        eos_token_id=1,
    ),
    "llama3-8b": LlamaConfig(
        vocab_size=128256,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        max_position_embeddings=8192,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        bos_token_id=128000,
        eos_token_id=128009,
    ),
}


@dataclass(frozen=True)
class ProjectorConfig:
    """Multimodal projector (reference base_projector.py:63-94)."""

    projector_type: str = "mlp_downsample"  # identity|linear|mlp_downsample|mlpNx_gelu
    mm_hidden_size: int = 1152
    hidden_size: int = 4096


@dataclass(frozen=True)
class RegionExtractorConfig:
    """Region extractor (reference base_extractor.py:104-177)."""

    extractor_type: str = "regiongpt"
    mm_hidden_size: int = 1152
    hidden_size: int = 4096
    # deconvNx: (N-1) x [ConvT(k2,s2) + LayerNorm2d + GELU] + ConvT + GELU
    deconv_depth: int = 2
    # AdaptiveAvgPool2d target for the global (low-res) branch.
    ada_pool_size: int = 27
    mask_threshold: float = 0.5


@dataclass(frozen=True)
class SpatialRGPTConfig:
    """Composite VLM config: llm + vision tower + projector + region extractor."""

    llm: LlamaConfig = field(default_factory=lambda: LLAMA_PRESETS["llama3-8b"])
    vision: SiglipVisionConfig = field(default_factory=SiglipVisionConfig)
    projector: ProjectorConfig = field(default_factory=ProjectorConfig)
    region: RegionExtractorConfig = field(default_factory=RegionExtractorConfig)

    enable_region: bool = True
    enable_depth: bool = True
    # Token ids of <mask> / <depth> in the extended tokenizer vocabulary.
    # The reference records these into the vision-tower config at load time
    # (model/builder.py:186-192); here they are first-class fields.
    mask_token_id: int = -1
    depth_token_id: int = -1

    image_aspect_ratio: str = "resize"  # resize | pad
    model_max_length: int = 4096
    # Extra embedding rows appended past llm.vocab_size for <mask>/<depth>.
    num_extra_tokens: int = 0

    def replace(self, **kw) -> "SpatialRGPTConfig":
        return dataclasses.replace(self, **kw)

    @property
    def extended_vocab_size(self) -> int:
        return self.llm.vocab_size + self.num_extra_tokens

    # ---- serialization -------------------------------------------------
    def to_json(self) -> str:
        d = _asdict(self)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, text: str) -> "SpatialRGPTConfig":
        d = json.loads(text)
        return cls(
            llm=LlamaConfig(**d["llm"]),
            vision=SiglipVisionConfig(**d["vision"]),
            projector=ProjectorConfig(**d["projector"]),
            region=RegionExtractorConfig(**d["region"]),
            **{
                k: v
                for k, v in d.items()
                if k not in ("llm", "vision", "projector", "region")
            },
        )

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "SpatialRGPTConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_json(f.read())


def preset(name: str, **overrides) -> SpatialRGPTConfig:
    """Build a composite config for a named model family."""
    llm = LLAMA_PRESETS[name]
    cfg = SpatialRGPTConfig(
        llm=llm,
        projector=ProjectorConfig(hidden_size=llm.hidden_size),
        region=RegionExtractorConfig(hidden_size=llm.hidden_size),
    )
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
