"""LoRA / DoRA adaptation.

Rebuild of the reference's PEFT-based LoRA path (llava/train/train.py:
550-589 ``lora_enable`` and :401-421 4/8-bit QLoRA): low-rank adapters on
the decoder's linear projections, trained with the base frozen, saved
separately (``adapter.npz`` == adapter_model.bin + the reference's
``non_lora_trainables.bin`` for any co-trained modules), and mergeable
back into the base weights for serving.

Functional design: adapters live in their own pytree mirroring the target
kernels; ``apply_lora`` returns base params with ``W + (a @ b) * scale``
merged (cheap at the scales involved, and XLA fuses the add), so model
code needs no changes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


@dataclass(frozen=True)
class LoraConfig:
    r: int = 64
    alpha: float = 16.0
    dropout: float = 0.0  # applied by caller on inputs if desired
    targets: tuple = DEFAULT_TARGETS
    use_dora: bool = False

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _is_target(path: str, targets) -> bool:
    parts = path.split("/")
    return any(t in parts for t in targets) and parts[-1] == "kernel"


def _walk_kernels(node, path=""):
    """Yield (kernel_path, node_dict) for every {kernel} or {kernel_q}
    weight node in a (possibly int8/int4-quantized, ops/quant.py) tree.
    kernel_path uses the plain '/kernel' suffix either way, so adapters
    trained against a bf16 base apply to a quantized one and vice versa
    (the QLoRA contract, reference train.py:401-421)."""
    if isinstance(node, dict):
        if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
            yield f"{path}/kernel" if path else "kernel", node
            return
        if "kernel_q" in node:
            yield f"{path}/kernel" if path else "kernel", node
            return
        for k, v in node.items():
            yield from _walk_kernels(v, f"{path}/{k}" if path else str(k))
    elif isinstance(node, list):
        for i, v in enumerate(node):
            yield from _walk_kernels(v, f"{path}/{i}" if path else str(i))


def _node_weight(node, dtype=jnp.float32) -> jax.Array:
    if "kernel" in node:
        return node["kernel"].astype(dtype)
    from spatialrgpt_tpu.ops.quant import dequantize

    return dequantize(node["kernel_q"], dtype)


def _node_shape(node):
    if "kernel" in node:
        return tuple(node["kernel"].shape)
    qw = node["kernel_q"]
    if "orig_dim0" not in qw:  # int8
        return tuple(qw["q"].shape)
    return (qw["orig_dim0"].shape[0],) + tuple(qw["q"].shape[1:])  # int4


def init_lora(rng: jax.Array, llm_params: Dict, lcfg: LoraConfig, dtype=jnp.float32) -> Dict:
    """Adapter pytree: for each targeted kernel (fi, fo) -> {a (fi, r),
    b (r, fo)}; a ~ N(0, 1/fi), b = 0 (standard init).  Accepts bf16 or
    quantized (kernel_q) base trees — the QLoRA path."""
    targets = list(_walk_kernels(llm_params))
    adapters = {}
    keys = jax.random.split(rng, max(len(targets), 1))
    for (path_str, node), key in zip(targets, keys):
        if not _is_target(path_str, lcfg.targets):
            continue
        fi, fo = _node_shape(node)
        adapters[path_str] = {
            "a": jax.random.normal(key, (fi, lcfg.r), dtype) * (fi**-0.5),
            "b": jnp.zeros((lcfg.r, fo), dtype),
        }
        if lcfg.use_dora:
            # DoRA: learned magnitude per output column
            mag = jnp.linalg.norm(_node_weight(node), axis=0)
            adapters[path_str]["m"] = mag.astype(dtype)
    return adapters


def apply_lora(
    llm_params: Dict, adapters: Dict, lcfg: LoraConfig, dtype=None, merge: bool = True
) -> Dict:
    """Base params with adapters merged: W' = W + a @ b * scale (LoRA) or
    the DoRA magnitude-renormalized variant.

    ``merge=False`` attaches the adapters to the weight node instead
    (``node["lora"] = {a, b, scale}``) and ``ops/layers.linear`` computes
    the side branch ``y += (x @ a) @ b * scale`` — mathematically the
    same product, but the base kernel is never rewritten.  This is the
    QLoRA memory contract that merging cannot honor at 8B: merged
    kernels are consumed again by the backward (dx needs W'^T), so under
    autodiff the "transient per-layer temp" becomes a stashed or
    recomputed full bf16 tree — measured 17.3 GB total on the 16 GB chip
    (BASELINE.md round 5).  The side branch keeps the base on the int8
    read path in both directions; only rank-r factors carry gradients.
    DoRA still requires the merged form (its column norms are of W').
    """
    if not merge:
        assert not lcfg.use_dora, "DoRA requires merged application"

    def visit(node, path=""):
        if isinstance(node, dict):
            is_weight = ("kernel" in node and getattr(node["kernel"], "ndim", 0) == 2) or (
                "kernel_q" in node
            )
            if is_weight:
                kpath = f"{path}/kernel" if path else "kernel"
                ad = adapters.get(kpath)
                if ad is None:
                    return node
                # MoE expert kernels are stacked and consumed by einsum
                # (models/llama.py), not ops/layers.linear — the side
                # branch would be silently dropped there, so experts
                # always take the merged form (they are per-expert small).
                if not merge and "experts" not in path.split("/"):
                    out = dict(node)
                    out["lora"] = {"a": ad["a"], "b": ad["b"], "scale": lcfg.scale}
                    return out
                w = _node_weight(node)
                out_dtype = dtype or (
                    node["kernel"].dtype if "kernel" in node else jnp.bfloat16
                )
                delta = jnp.dot(
                    ad["a"].astype(jnp.float32), ad["b"].astype(jnp.float32)
                ) * lcfg.scale
                w = w + delta
                if lcfg.use_dora and "m" in ad:
                    norm = jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-6
                    w = w / norm * ad["m"].astype(jnp.float32)[None, :]
                out = {k: v for k, v in node.items() if k not in ("kernel", "kernel_q")}
                out["kernel"] = w.astype(out_dtype)
                return out
            return {k: visit(v, f"{path}/{k}" if path else str(k)) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v, f"{path}/{i}" if path else str(i)) for i, v in enumerate(node)]
        return node

    return visit(llm_params)


def merge_lora(llm_params: Dict, adapters: Dict, lcfg: LoraConfig) -> Dict:
    """Permanently fold adapters into the base weights (serving)."""
    return apply_lora(llm_params, adapters, lcfg)


def save_adapters(path: str, adapters: Dict, lcfg: LoraConfig) -> None:
    from spatialrgpt_tpu.utils.checkpoint import save_pytree

    save_pytree(path, {"adapters": adapters, "config": {
        "r": jnp.asarray(lcfg.r), "alpha": jnp.asarray(lcfg.alpha)}})


def load_adapters(path: str) -> Dict:
    from spatialrgpt_tpu.utils.checkpoint import load_pytree

    return load_pytree(path)["adapters"]
