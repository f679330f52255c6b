"""Multimodal projector (vision tokens -> LLM embedding space).

Re-implements the reference's ``MultimodalProjector``
(llava/model/multimodal_projector/base_projector.py:63-94).  The default
``mlp_downsample`` variant packs 2x2 neighbouring patches into channels
(flat_square, base_projector.py:41-52) so 729 SigLIP tokens (27x27, zero-pad
to 28x28) become 196 LLM tokens (14x14), then LayerNorm -> Linear -> GELU ->
Linear.

The flat_square permutation is subtle: torch does
``view(n, w, h/2, c*2) -> permute(0,2,1,3) -> view(n, h/2, w/2, c*4)``,
which interleaves (row-pair, column) rather than a plain 2x2 space-to-depth.
We reproduce it exactly so checkpoint weights stay valid.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.config import ProjectorConfig
from spatialrgpt_tpu.ops.layers import gelu_erf, layer_norm, linear

Params = Dict


def init_params(rng: jax.Array, cfg: ProjectorConfig, dtype=jnp.float32) -> Params:
    if cfg.projector_type == "mlp_downsample":
        k1, k2 = jax.random.split(rng)
        c4 = cfg.mm_hidden_size * 4
        h = cfg.hidden_size
        return {
            "ln": {"scale": jnp.ones((c4,), dtype), "bias": jnp.zeros((c4,), dtype)},
            "fc1": {
                "kernel": jax.random.normal(k1, (c4, h), dtype) * (c4**-0.5),
                "bias": jnp.zeros((h,), dtype),
            },
            "fc2": {
                "kernel": jax.random.normal(k2, (h, h), dtype) * (h**-0.5),
                "bias": jnp.zeros((h,), dtype),
            },
        }
    if cfg.projector_type == "linear":
        return {
            "fc": {
                "kernel": jax.random.normal(
                    rng, (cfg.mm_hidden_size, cfg.hidden_size), dtype
                )
                * (cfg.mm_hidden_size**-0.5),
                "bias": jnp.zeros((cfg.hidden_size,), dtype),
            }
        }
    if cfg.projector_type == "identity":
        return {}
    raise ValueError(f"Unknown projector type: {cfg.projector_type}")


def flat_square(x: jax.Array) -> jax.Array:
    """(N, W, H, C) -> (N, H/2, W/2, 4C) with the reference's exact layout.

    Zero-pads odd W/H by one (base_projector.py:43-48), then:
      view(n, w, h/2, 2c): pairs adjacent h positions into channels
      permute(0, 2, 1, 3) + view(n, h/2, w/2, 4c): pairs adjacent w positions.
    """
    n, w, h, c = x.shape
    if w % 2 == 1:
        x = jnp.concatenate([x, jnp.zeros((n, 1, h, c), x.dtype)], axis=1)
        w += 1
    if h % 2 == 1:
        x = jnp.concatenate([x, jnp.zeros((n, w, 1, c), x.dtype)], axis=2)
        h += 1
    x = x.reshape(n, w, h // 2, c * 2)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(n, h // 2, w // 2, c * 4)
    return x


def forward(params: Params, x: jax.Array, cfg: ProjectorConfig) -> jax.Array:
    """x: (N, num_tokens, mm_hidden) -> (N, out_tokens, hidden)."""
    if cfg.projector_type == "identity":
        return x
    if cfg.projector_type == "linear":
        return linear(x, params["fc"])
    if cfg.projector_type == "mlp_downsample":
        n, hw, c = x.shape
        side = int(round(hw**0.5))
        x = x.reshape(n, side, side, c)
        x = flat_square(x)
        x = x.reshape(n, -1, c * 4)
        x = layer_norm(x, params["ln"], eps=1e-5)
        x = linear(x, params["fc1"])
        x = gelu_erf(x)
        x = linear(x, params["fc2"])
        return x
    raise ValueError(f"Unknown projector type: {cfg.projector_type}")
