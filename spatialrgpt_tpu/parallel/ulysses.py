"""Ulysses sequence parallelism: head-scatter / sequence-gather all-to-all.

TPU-native equivalent of the reference's UlyssesAttention
(llava/train/sequence_parallel/ulysses_attn.py:65-199 +
all_to_all.py:22-162): inside ``shard_map`` over the ``sp`` mesh axis, each
device holds a sequence shard (B, S/P, H, D); one ``lax.all_to_all``
reshards to full sequence x head shard (B, S, H/P, D); local flash
attention runs on the full sequence; the inverse all-to-all restores the
sequence shard.  The reference's ragged-length padding dance
(all_to_all.py:44-89) is unnecessary: shards are statically equal by
construction.  Backward = the same all-to-alls reversed, which JAX derives
automatically (all_to_all is linear).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.ops import attention as attn_ops


def ulysses_attention(
    q: jax.Array,  # (B, S_local, Hq, D) - sequence-sharded
    k: jax.Array,  # (B, S_local, Hk, D)
    v: jax.Array,  # (B, S_local, Hk, D)
    segment_ids: Optional[jax.Array],  # (B, S_local) or None
    axis_name: str = "sp",
    impl: str = "xla",
    causal: bool = True,
) -> jax.Array:
    """Must be called inside shard_map with ``axis_name`` bound.

    Head counts must divide the sp degree (the reference asserts the same,
    hybrid_attn.py:291-294); with GQA we require Hk % sp == 0.
    """
    sp = jax.lax.axis_size(axis_name)
    if sp == 1:
        return attn_ops.causal_attention(q, k, v, segment_ids=segment_ids, impl=impl)
    if q.shape[2] % sp != 0 or k.shape[2] % sp != 0:
        # enforce the docstring contract loudly: an 8-kv-head model at
        # sp=16 would otherwise silently mis-reshard via all_to_all
        raise ValueError(
            f"Ulysses degree {sp} must divide both head counts "
            f"(Hq={q.shape[2]}, Hk={k.shape[2]}); repeat KV heads or lower "
            f"the ulysses degree (reference asserts the same, "
            f"hybrid_attn.py:291-294)"
        )

    # (B, S/P, H, D) -> (B, S, H/P, D): split heads, concat sequence
    def scatter_heads(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    def gather_heads(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    qg = scatter_heads(q)
    kg = scatter_heads(k)
    vg = scatter_heads(v)

    seg_full = None
    if segment_ids is not None:
        # gather the full-sequence segment ids (reference all-reduces the
        # global attention mask, ulysses_attn.py:125-164)
        seg_full = jax.lax.all_gather(segment_ids, axis_name, axis=1, tiled=True)

    out = attn_ops.causal_attention(qg, kg, vg, segment_ids=seg_full, impl=impl)
    return gather_heads(out)
