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


def init_lora(rng: jax.Array, llm_params: Dict, lcfg: LoraConfig, dtype=jnp.float32) -> Dict:
    """Adapter pytree: for each targeted kernel (fi, fo) -> {a (fi, r),
    b (r, fo)}; a ~ N(0, 1/fi), b = 0 (standard init)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(llm_params)
    adapters = {}
    keys = jax.random.split(rng, len(flat))
    for (path, leaf), key in zip(flat, keys):
        path_str = "/".join(_key_name(p) for p in path)
        if _is_target(path_str, lcfg.targets) and leaf.ndim == 2:
            fi, fo = leaf.shape
            adapters[path_str] = {
                "a": jax.random.normal(key, (fi, lcfg.r), dtype) * (fi**-0.5),
                "b": jnp.zeros((lcfg.r, fo), dtype),
            }
            if lcfg.use_dora:
                # DoRA: learned magnitude per output column
                mag = jnp.linalg.norm(leaf.astype(jnp.float32), axis=0)
                adapters[path_str]["m"] = mag.astype(dtype)
    return adapters


def _key_name(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def apply_lora(llm_params: Dict, adapters: Dict, lcfg: LoraConfig) -> Dict:
    """Base params with adapters merged: W' = W + a @ b * scale (LoRA) or
    the DoRA magnitude-renormalized variant."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(llm_params)
    out = []
    for path, leaf in flat:
        path_str = "/".join(_key_name(p) for p in path)
        ad = adapters.get(path_str)
        if ad is None:
            out.append(leaf)
            continue
        delta = jnp.dot(
            ad["a"].astype(jnp.float32), ad["b"].astype(jnp.float32)
        ) * lcfg.scale
        w = leaf.astype(jnp.float32) + delta
        if lcfg.use_dora and "m" in ad:
            norm = jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-6
            w = w / norm * ad["m"].astype(jnp.float32)[None, :]
        out.append(w.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


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
