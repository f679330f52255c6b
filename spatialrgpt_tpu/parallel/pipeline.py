"""Pipeline parallelism for the decoder stack (GPipe schedule).

The reference has no pipeline parallelism (SURVEY.md §2.7: "PP: none");
this is a TPU-native addition: stages are contiguous layer blocks sharded
over a ``pp`` mesh axis, activations flow stage-to-stage with
``lax.ppermute`` inside ``shard_map``, and the whole schedule is a
``lax.scan`` over ticks — reverse-mode autodiff through the scan gives
the backward pipeline for free (activations of the forward ticks are the
saved residuals, GPipe-style; wrap the stage body in ``jax.checkpoint``
via ``remat=True`` to trade recompute for memory).

Layout contract:
  - layer params are stacked across layers (``stack_layer_params``):
    every leaf gains a leading (L,) axis, sharded P('pp') -> each device
    holds its stage's (L/pp, ...) block.
  - the batch is split into M microbatches along the batch axis; tick t
    has stage s processing microbatch t-s (bubble fraction (pp-1)/(M+pp-1)).
  - position_ids/segment_ids travel with their microbatch through the
    ring so each stage masks attention for the tokens it is holding.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatialrgpt_tpu.config import LlamaConfig


def stack_layer_params(llm_params: Dict) -> Dict:
    """Stack the per-layer param list into leading-axis arrays.

    Requires homogeneous layers (dense llama/mistral/gemma families; for
    sparse-MoE use stacked experts first so every layer has the same
    tree).  Non-layer params (embeds, final_ln, lm_head) pass through.
    """
    layers = llm_params["layers"]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in llm_params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def pp_shard_params(stacked_params: Dict, mesh: Mesh, axis_name: str = "pp") -> Dict:
    """Place a stacked tree for the pipeline: layers_stacked shards its
    leading (layer) axis over the pp mesh axis; everything else
    (embeddings, final norm, head) replicates."""
    out = {}
    rep = NamedSharding(mesh, P())
    layer_sh = NamedSharding(mesh, P(axis_name))
    for k, v in stacked_params.items():
        if k == "layers_stacked":
            out[k] = jax.tree_util.tree_map(lambda x: jax.device_put(x, layer_sh), v)
        else:
            out[k] = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), v)
    return out


def _stage_apply(stage_layers, x, pos, seg, cfg: LlamaConfig, remat: bool):
    """Run this device's contiguous layer block via scan over the stacked
    leading axis."""
    from spatialrgpt_tpu.models import llama

    def body(h, layer_p):
        h, _, _ = llama._decoder_layer(
            h, layer_p, cfg, pos, seg, 0, None, "xla", False
        )
        return h, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, stage_layers)
    return x


@partial(
    jax.jit,
    static_argnames=("cfg", "axis_name", "num_microbatches", "remat", "mesh"),
)
def pipeline_forward(
    stacked_params: Dict,
    cfg: LlamaConfig,
    *,
    inputs_embeds: jax.Array,  # (B, S, H) global
    position_ids: jax.Array,  # (B, S)
    segment_ids: Optional[jax.Array],  # (B, S)
    mesh: Mesh,
    axis_name: str = "pp",
    num_microbatches: int = 0,  # 0 -> one per pipeline stage
    remat: bool = False,
) -> jax.Array:
    """Decoder hidden states via the pipelined stack (pre-final-norm
    layers; the caller applies final_ln/logits — those are tiny and
    stage-agnostic).  Differentiable end to end.
    """
    pp = mesh.shape[axis_name]
    B, S, H = inputs_embeds.shape
    M = num_microbatches or pp
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    Bm = B // M
    if segment_ids is None:
        segment_ids = jnp.ones((B, S), jnp.int32)

    mb_x = inputs_embeds.reshape(M, Bm, S, H)
    mb_pos = position_ids.reshape(M, Bm, S)
    mb_seg = segment_ids.reshape(M, Bm, S)

    def pipelined(stage_layers, mb_x, mb_pos, mb_seg):
        stage = jax.lax.axis_index(axis_name)
        fwd = [(i, (i + 1) % pp) for i in range(pp)]
        T = M + pp - 1

        def tick(carry, t):
            x, pos, seg, outs = carry
            # stage 0 injects microbatch t (clamped; invalid ticks discarded)
            inject = jnp.clip(t, 0, M - 1)
            x = jnp.where(stage == 0, mb_x[inject], x)
            pos = jnp.where(stage == 0, mb_pos[inject], pos)
            seg = jnp.where(stage == 0, mb_seg[inject], seg)

            y = _stage_apply(stage_layers, x, pos, seg, cfg, remat)

            # last stage collects microbatch t-(pp-1) when in range
            out_idx = t - (pp - 1)
            valid_out = (stage == pp - 1) & (out_idx >= 0)
            slot = jnp.clip(out_idx, 0, M - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(valid_out, y, outs[slot]),
                slot,
                axis=0,
            )

            # rotate activations (and their pos/seg) to the next stage
            x = jax.lax.ppermute(y, axis_name, fwd)
            pos = jax.lax.ppermute(pos, axis_name, fwd)
            seg = jax.lax.ppermute(seg, axis_name, fwd)
            return (x, pos, seg, outs), None

        outs0 = jnp.zeros((M, Bm, S, H), inputs_embeds.dtype)
        x0 = jnp.zeros((Bm, S, H), inputs_embeds.dtype)
        pos0 = jnp.zeros((Bm, S), mb_pos.dtype)
        seg0 = jnp.zeros((Bm, S), mb_seg.dtype)
        (x, pos, seg, outs), _ = jax.lax.scan(
            tick, (x0, pos0, seg0, outs0), jnp.arange(T)
        )
        # broadcast the last stage's outputs to every device (psum of the
        # masked buffer); keeps out_specs replicated and differentiable
        outs = jax.lax.psum(
            jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)), axis_name
        )
        return outs

    out = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params["layers_stacked"], mb_x, mb_pos, mb_seg)
    return out.reshape(B, S, H)


def pipeline_logits(
    stacked_params: Dict,
    cfg: LlamaConfig,
    *,
    input_ids: jax.Array,
    position_ids: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    mesh: Mesh,
    axis_name: str = "pp",
    num_microbatches: int = 0,
    remat: bool = False,
) -> jax.Array:
    """ids -> logits through the pipelined decoder (embed + pipeline +
    final norm + lm head; the embedding/head stay replicated)."""
    from spatialrgpt_tpu.models import llama

    x = llama.embed_tokens(stacked_params, input_ids, cfg)
    h = pipeline_forward(
        stacked_params,
        cfg,
        inputs_embeds=x,
        position_ids=position_ids,
        segment_ids=segment_ids,
        mesh=mesh,
        axis_name=axis_name,
        num_microbatches=num_microbatches,
        remat=remat,
    )
    h = llama._norm(h, stacked_params["final_ln"], cfg)
    return llama.logits(stacked_params, h, cfg)
