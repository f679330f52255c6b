"""Checkpoint I/O: HF/PyTorch state-dict -> JAX pytree converters, plus
native orbax-style save/load of our own pytrees.

The reference stores composite checkpoints as four HF subdirectories
(``llm/ vision_tower/ mm_projector/ region_extractor/``,
llava/model/llava_arch.py:181-250).  We read that exact layout: each subdir's
``*.safetensors`` (or ``pytorch_model.bin``) tensors are converted into our
parameter pytrees by the per-module converters below.  No torch dependency on
the hot path — tensors arrive as numpy arrays.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


# ---------------------------------------------------------------------------
# State-dict loading (safetensors / torch .bin), torch-free where possible
# ---------------------------------------------------------------------------


def load_state_dict(model_dir: str) -> Dict[str, Array]:
    """Load all tensors from an HF model directory into numpy arrays."""
    out: Dict[str, Array] = {}
    entries = sorted(os.listdir(model_dir))
    st_files = [e for e in entries if e.endswith(".safetensors")]
    bin_files = [e for e in entries if e.endswith(".bin")]
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            out.update(load_file(os.path.join(model_dir, f)))
    elif bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(
                os.path.join(model_dir, f), map_location="cpu", weights_only=True
            )
            for k, v in sd.items():
                out[k] = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
    else:
        raise FileNotFoundError(f"no weights found under {model_dir}")
    return out


def _np(x) -> Array:
    """Coerce torch tensors / jax arrays to numpy (fp32 for bf16 torch)."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu()
        import torch

        if x.dtype == torch.bfloat16:
            x = x.float()
        return x.numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Per-module converters (HF names -> our pytrees)
# ---------------------------------------------------------------------------


def _dense(sd: StateDict, prefix: str, dtype) -> Dict:
    p = {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T, dtype)}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]), dtype)
    return p


def _ln(sd: StateDict, prefix: str, dtype) -> Dict:
    return {
        "scale": jnp.asarray(_np(sd[prefix + ".weight"]), dtype),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"]), dtype),
    }


def convert_siglip(sd: StateDict, num_layers: int, dtype=jnp.float32) -> Dict:
    """HF SiglipVisionModel state dict -> models/siglip.py pytree."""
    # Tolerate both "vision_model.*" and bare prefixes.
    pref = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    emb = pref + "embeddings."
    layers = []
    for i in range(num_layers):
        lp = f"{pref}encoder.layers.{i}."
        layers.append(
            {
                "ln1": _ln(sd, lp + "layer_norm1", dtype),
                "ln2": _ln(sd, lp + "layer_norm2", dtype),
                "attn": {
                    "wq": _dense(sd, lp + "self_attn.q_proj", dtype),
                    "wk": _dense(sd, lp + "self_attn.k_proj", dtype),
                    "wv": _dense(sd, lp + "self_attn.v_proj", dtype),
                    "wo": _dense(sd, lp + "self_attn.out_proj", dtype),
                },
                "mlp": {
                    "fc1": _dense(sd, lp + "mlp.fc1", dtype),
                    "fc2": _dense(sd, lp + "mlp.fc2", dtype),
                },
            }
        )
    return {
        "patch_embed": {
            # torch conv (C_out, C_in, kh, kw) -> HWIO
            "kernel": jnp.asarray(
                _np(sd[emb + "patch_embedding.weight"]).transpose(2, 3, 1, 0), dtype
            ),
            "bias": jnp.asarray(_np(sd[emb + "patch_embedding.bias"]), dtype),
        },
        "pos_embed": jnp.asarray(_np(sd[emb + "position_embedding.weight"]), dtype),
        "layers": layers,
        "post_ln": _ln(sd, pref + "post_layernorm", dtype),
    }


def convert_projector(sd: StateDict, projector_type: str, dtype=jnp.float32) -> Dict:
    """Reference MultimodalProjector state dict -> models/projector.py pytree.

    mlp_downsample layout (base_projector.py:74-80): layers.1 = LayerNorm,
    layers.2 = Linear, layers.4 = Linear (3 is GELU, 0 is DownSampleBlock).
    """
    pref = "layers." if any(k.startswith("layers.") for k in sd) else "mm_projector.layers."
    if projector_type == "mlp_downsample":
        return {
            "ln": _ln(sd, pref + "1", dtype),
            "fc1": _dense(sd, pref + "2", dtype),
            "fc2": _dense(sd, pref + "4", dtype),
        }
    if projector_type == "linear":
        return {"fc": _dense(sd, pref.rstrip(".") if pref == "layers." else pref, dtype)}
    raise ValueError(projector_type)


def convert_region_extractor(sd: StateDict, deconv_depth: int = 2, dtype=jnp.float32) -> Dict:
    """Reference RegionExtractor state dict -> models/region_extractor.py pytree.

    feature_refinement_module for deconv2x (base_extractor.py:87-101):
      0: ConvTranspose2d, 1: LayerNorm2d, 2: GELU, 3: ConvTranspose2d, 4: GELU
    torch ConvTranspose2d weight is (C_in, C_out, kh, kw) -> HWOI for
    lax.conv_transpose we use (kh, kw, C_in, C_out) with transpose_kernel.
    """
    deconvs = []
    lns = []
    idx = 0
    for d in range(deconv_depth):
        wp = f"feature_refinement_module.{idx}"
        deconvs.append(
            {
                "kernel": jnp.asarray(
                    _np(sd[wp + ".weight"]).transpose(2, 3, 0, 1), dtype
                ),  # (kh, kw, C_in, C_out)
                "bias": jnp.asarray(_np(sd[wp + ".bias"]), dtype),
            }
        )
        idx += 1
        if d < deconv_depth - 1:
            lnp = f"feature_refinement_module.{idx}"
            lns.append(
                {
                    "scale": jnp.asarray(_np(sd[lnp + ".weight"]), dtype),
                    "bias": jnp.asarray(_np(sd[lnp + ".bias"]), dtype),
                }
            )
            idx += 2  # skip GELU
        else:
            idx += 1  # skip final GELU
    return {
        "deconvs": deconvs,
        "lns": lns,
        "rgb_projector": _dense(sd, "rgb_projector", dtype),
        "depth_projector": _dense(sd, "depth_projector", dtype),
    }


def convert_llama(sd: StateDict, num_layers: int, dtype=jnp.float32) -> Dict:
    """HF LlamaForCausalLM-family state dict -> models/llama.py pytree.

    Also handles Mistral (same names), Gemma (same names) and Mixtral
    (``block_sparse_moe.gate`` router + ``experts.{e}.w1/w3/w2`` =
    gate/up/down)."""
    pref = "model." if any(k.startswith("model.") for k in sd) else ""
    layers = []
    for i in range(num_layers):
        lp = f"{pref}layers.{i}."
        layer = {
            "input_ln": jnp.asarray(_np(sd[lp + "input_layernorm.weight"]), dtype),
            "post_ln": jnp.asarray(
                _np(sd[lp + "post_attention_layernorm.weight"]), dtype
            ),
            "attn": {
                "wq": _dense(sd, lp + "self_attn.q_proj", dtype),
                "wk": _dense(sd, lp + "self_attn.k_proj", dtype),
                "wv": _dense(sd, lp + "self_attn.v_proj", dtype),
                "wo": _dense(sd, lp + "self_attn.o_proj", dtype),
            },
        }
        if lp + "block_sparse_moe.gate.weight" in sd:
            layer["router"] = _dense(sd, lp + "block_sparse_moe.gate", dtype)
            experts = []
            e = 0
            while lp + f"block_sparse_moe.experts.{e}.w1.weight" in sd:
                ep = lp + f"block_sparse_moe.experts.{e}."
                experts.append(
                    {
                        "gate": _dense(sd, ep + "w1", dtype),
                        "down": _dense(sd, ep + "w2", dtype),
                        "up": _dense(sd, ep + "w3", dtype),
                    }
                )
                e += 1
            layer["experts"] = experts
        else:
            layer["mlp"] = {
                "gate": _dense(sd, lp + "mlp.gate_proj", dtype),
                "up": _dense(sd, lp + "mlp.up_proj", dtype),
                "down": _dense(sd, lp + "mlp.down_proj", dtype),
            }
        layers.append(layer)
    params = {
        "embed_tokens": jnp.asarray(_np(sd[pref + "embed_tokens.weight"]), dtype),
        "layers": layers,
        "final_ln": jnp.asarray(_np(sd[pref + "norm.weight"]), dtype),
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": jnp.asarray(_np(sd["lm_head.weight"]).T, dtype)}
    return params


# ---------------------------------------------------------------------------
# Composite checkpoint load (reference split-directory layout)
# ---------------------------------------------------------------------------


def load_reference_checkpoint(root: str, cfg, dtype=jnp.bfloat16) -> Dict:
    """Load a reference-format composite checkpoint directory into our
    composite VLM pytree: {vision, projector, region, llm}."""
    params = {}
    params["vision"] = convert_siglip(
        load_state_dict(os.path.join(root, "vision_tower")),
        cfg.vision.num_hidden_layers,
        dtype,
    )
    params["projector"] = convert_projector(
        load_state_dict(os.path.join(root, "mm_projector")),
        cfg.projector.projector_type,
        dtype,
    )
    if cfg.enable_region:
        params["region"] = convert_region_extractor(
            load_state_dict(os.path.join(root, "region_extractor")),
            cfg.region.deconv_depth,
            dtype,
        )
    params["llm"] = convert_llama(
        load_state_dict(os.path.join(root, "llm")), cfg.llm.num_hidden_layers, dtype
    )
    return params


# ---------------------------------------------------------------------------
# Native pytree save/load
# ---------------------------------------------------------------------------


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays (msgpack-free, single-file numpy archive)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8), **arrs)


def load_pytree(path: str):
    with np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
