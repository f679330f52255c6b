"""Export our parameter pytrees back to the reference's checkpoint layout.

Inverse of utils/checkpoint.py's converters: writes the composite
``llm/ vision_tower/ mm_projector/ region_extractor/`` directory layout
with HF tensor names (llava_arch.py:181-250 save contract), as safetensors,
so checkpoints trained here load in the PyTorch reference and vice versa.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _np32(x) -> np.ndarray:
    """To numpy, upcasting bfloat16 (not representable in safetensors'
    consumers' torch-free path) to float32."""
    a = np.asarray(x)
    try:
        import ml_dtypes

        if a.dtype == ml_dtypes.bfloat16:
            a = a.astype(np.float32)
    except ImportError:
        pass
    return a


def export_siglip(params: Dict) -> Dict[str, np.ndarray]:
    sd = {}
    pe = params["patch_embed"]
    sd["vision_model.embeddings.patch_embedding.weight"] = _np32(pe["kernel"]).transpose(3, 2, 0, 1)
    sd["vision_model.embeddings.patch_embedding.bias"] = _np32(pe["bias"])
    sd["vision_model.embeddings.position_embedding.weight"] = _np32(params["pos_embed"])
    for i, lp in enumerate(params["layers"]):
        p = f"vision_model.encoder.layers.{i}."
        sd[p + "layer_norm1.weight"] = _np32(lp["ln1"]["scale"])
        sd[p + "layer_norm1.bias"] = _np32(lp["ln1"]["bias"])
        sd[p + "layer_norm2.weight"] = _np32(lp["ln2"]["scale"])
        sd[p + "layer_norm2.bias"] = _np32(lp["ln2"]["bias"])
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "out_proj")):
            sd[p + f"self_attn.{theirs}.weight"] = _np32(lp["attn"][ours]["kernel"]).T
            sd[p + f"self_attn.{theirs}.bias"] = _np32(lp["attn"][ours]["bias"])
        sd[p + "mlp.fc1.weight"] = _np32(lp["mlp"]["fc1"]["kernel"]).T
        sd[p + "mlp.fc1.bias"] = _np32(lp["mlp"]["fc1"]["bias"])
        sd[p + "mlp.fc2.weight"] = _np32(lp["mlp"]["fc2"]["kernel"]).T
        sd[p + "mlp.fc2.bias"] = _np32(lp["mlp"]["fc2"]["bias"])
    sd["vision_model.post_layernorm.weight"] = _np32(params["post_ln"]["scale"])
    sd["vision_model.post_layernorm.bias"] = _np32(params["post_ln"]["bias"])
    return sd


def export_projector(params: Dict, projector_type: str = "mlp_downsample") -> Dict[str, np.ndarray]:
    if projector_type != "mlp_downsample":
        raise NotImplementedError(projector_type)
    return {
        "layers.1.weight": _np32(params["ln"]["scale"]),
        "layers.1.bias": _np32(params["ln"]["bias"]),
        "layers.2.weight": _np32(params["fc1"]["kernel"]).T,
        "layers.2.bias": _np32(params["fc1"]["bias"]),
        "layers.4.weight": _np32(params["fc2"]["kernel"]).T,
        "layers.4.bias": _np32(params["fc2"]["bias"]),
    }


def export_region_extractor(params: Dict) -> Dict[str, np.ndarray]:
    sd = {}
    idx = 0
    n = len(params["deconvs"])
    for d, dc in enumerate(params["deconvs"]):
        sd[f"feature_refinement_module.{idx}.weight"] = _np32(dc["kernel"]).transpose(2, 3, 0, 1)
        sd[f"feature_refinement_module.{idx}.bias"] = _np32(dc["bias"])
        idx += 1
        if d < n - 1:
            ln = params["lns"][d]
            sd[f"feature_refinement_module.{idx}.weight"] = _np32(ln["scale"])
            sd[f"feature_refinement_module.{idx}.bias"] = _np32(ln["bias"])
            idx += 2
        else:
            idx += 1
    for name in ("rgb_projector", "depth_projector"):
        sd[name + ".weight"] = _np32(params[name]["kernel"]).T
        sd[name + ".bias"] = _np32(params[name]["bias"])
    return sd


def export_llama(params: Dict) -> Dict[str, np.ndarray]:
    sd = {"model.embed_tokens.weight": _np32(params["embed_tokens"])}
    for i, lp in enumerate(params["layers"]):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = _np32(lp["input_ln"])
        sd[p + "post_attention_layernorm.weight"] = _np32(lp["post_ln"])
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "o_proj")):
            sd[p + f"self_attn.{theirs}.weight"] = _np32(lp["attn"][ours]["kernel"]).T
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            sd[p + f"mlp.{theirs}.weight"] = _np32(lp["mlp"][ours]["kernel"]).T
    sd["model.norm.weight"] = _np32(params["final_ln"])
    if "lm_head" in params:
        sd["lm_head.weight"] = _np32(params["lm_head"]["kernel"]).T
    return sd


def save_composite(root: str, params: Dict, cfg) -> None:
    """Write the split composite checkpoint directory (reference layout)."""
    from safetensors.numpy import save_file

    os.makedirs(root, exist_ok=True)
    cfg.save(root)

    def dump(subdir, sd):
        d = os.path.join(root, subdir)
        os.makedirs(d, exist_ok=True)
        # transposed views are not C-contiguous; safetensors serializes the
        # raw buffer, so force contiguity or the data comes back scrambled
        sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
        save_file(sd, os.path.join(d, "model.safetensors"))

    dump("vision_tower", export_siglip(params["vision"]))
    dump("mm_projector", export_projector(params["projector"], cfg.projector.projector_type))
    if "region" in params:
        dump("region_extractor", export_region_extractor(params["region"]))
    dump("llm", export_llama(params["llm"]))


def _write_json(path: str, d: dict) -> None:
    import json

    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def save_composite_hf(root: str, params: Dict, cfg, tokenizer=None) -> None:
    """Write a composite checkpoint the PyTorch reference can load
    directly: ``save_composite``'s safetensors plus the HF config files
    each component loader reads (llava/model/builder.py:142-159,
    llava_arch.py init_vlm -> build_llm_and_tokenizer /
    build_vision_tower / build_mm_projector / build_region_extractor).

    The same directory also loads through our ``models/builder.py``
    (config.json is the reference LlavaConfig schema, which
    ``SpatialRGPTConfig.load`` detects and converts) — this is the
    cross-framework parity surface.

    ``tokenizer`` (a HF tokenizer) is saved into ``llm/``; the reference
    eval path requires one there and expects ``<mask>``/``<depth>``
    already present at ``cfg.mask_token_id`` / ``cfg.depth_token_id``.
    """
    save_composite(root, params, cfg)

    v = cfg.vision
    _write_json(
        os.path.join(root, "vision_tower", "config.json"),
        {
            "model_type": "siglip_vision_model",
            "architectures": ["SiglipVisionModel"],
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_hidden_layers,
            "num_attention_heads": v.num_attention_heads,
            "image_size": v.image_size,
            "patch_size": v.patch_size,
            "num_channels": 3,
            "layer_norm_eps": v.layer_norm_eps,
            "hidden_act": v.hidden_act,
            "attention_dropout": 0.0,
            # the attention-pool head is unused (features come from
            # hidden_states); disabling it keeps loads warning-free and
            # fully deterministic
            "vision_use_head": False,
            # the reference records the region token ids into the vision
            # tower config (model/builder.py:186-192; read back at
            # llava_arch.py:471,488)
            "llm_mask_token_id": cfg.mask_token_id,
            "llm_depth_token_id": cfg.depth_token_id,
        },
    )
    _write_json(
        os.path.join(root, "vision_tower", "preprocessor_config.json"),
        {
            "image_processor_type": "SiglipImageProcessor",
            "processor_class": "SiglipProcessor",
            "do_resize": True,
            "size": {"height": v.image_size, "width": v.image_size},
            "resample": 3,  # bicubic (SigLIP default; data/preprocess.py)
            "do_rescale": True,
            "rescale_factor": 1.0 / 255.0,
            "do_normalize": True,
            "image_mean": [0.5, 0.5, 0.5],
            "image_std": [0.5, 0.5, 0.5],
        },
    )

    L = cfg.llm
    llm_d = {
        "model_type": "llama",
        "architectures": ["LlamaForCausalLM"],
        # embed rows written by export_llama include the region tokens
        "vocab_size": int(params["llm"]["embed_tokens"].shape[0]),
        "hidden_size": L.hidden_size,
        "intermediate_size": L.intermediate_size,
        "num_hidden_layers": L.num_hidden_layers,
        "num_attention_heads": L.num_attention_heads,
        "num_key_value_heads": L.num_key_value_heads,
        "max_position_embeddings": L.max_position_embeddings,
        "rms_norm_eps": L.rms_norm_eps,
        "rope_theta": L.rope_theta,
        "hidden_act": L.hidden_act,
        "attention_bias": L.attention_bias,
        "tie_word_embeddings": L.tie_word_embeddings,
        "bos_token_id": L.bos_token_id,
        "eos_token_id": L.eos_token_id,
        "torch_dtype": "float32",
    }
    if L.rope_scaling_factor:
        llm_d["rope_scaling"] = {"type": "linear", "factor": L.rope_scaling_factor}
    _write_json(os.path.join(root, "llm", "config.json"), llm_d)

    _write_json(
        os.path.join(root, "mm_projector", "config.json"),
        {
            "model_type": "v2l_projector",
            "mm_projector_type": cfg.projector.projector_type,
        },
    )
    _write_json(
        os.path.join(root, "region_extractor", "config.json"),
        {
            "model_type": "region_extractor",
            "region_extractor_type": cfg.region.extractor_type,
        },
    )

    _write_json(
        os.path.join(root, "config.json"),
        {
            "model_type": "llava_llama",
            "architectures": ["LlavaLlamaModel"],
            # dict-valued sub-configs make the reference's
            # get_model_config (model/utils.py:25-55) resolve each
            # component to <root>/<name>
            "llm_cfg": llm_d,
            "vision_tower_cfg": {"resolved": "vision_tower"},
            "mm_projector_cfg": {"resolved": "mm_projector"},
            "region_extractor_cfg": {"resolved": "region_extractor"},
            "resume_path": root,
            "enable_region": cfg.enable_region,
            "enable_depth": cfg.enable_depth,
            "hidden_size": L.hidden_size,
            "mm_hidden_size": v.hidden_size,
            "image_aspect_ratio": cfg.image_aspect_ratio,
            "mm_vision_select_layer": v.select_layer,
            "mm_vision_select_feature": v.select_feature,
            "mm_use_im_start_end": False,
            "mm_use_im_patch_token": True,
            "model_max_length": cfg.model_max_length,
            "model_dtype": "torch.float32",
            "s2": False,
            "transformers_version": "4.36.0",
        },
    )

    if tokenizer is not None:
        tokenizer.save_pretrained(os.path.join(root, "llm"))
