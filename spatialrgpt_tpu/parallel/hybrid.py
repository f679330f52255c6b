"""Hybrid 2D sequence parallelism: Ulysses (head all-to-all) x Ring (KV
rotation), the TPU equivalent of the reference's HybridAttention
(llava/train/sequence_parallel/hybrid_attn.py): the ``sp`` axis factors as
sp = ulysses * ring; the all-to-all reshards heads over the ulysses
sub-axis and ring attention runs over the ring sub-axis on the
head-sharded, sequence-longer view.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.parallel.ring import ring_attention


def hybrid_attention(
    q: jax.Array,  # (B, S_local, Hq, D); S_local = S / (ulysses*ring)
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array],
    ulysses_axis: str = "sp_u",
    ring_axis: str = "sp_r",
) -> jax.Array:
    """Call inside shard_map with both axes bound.

    IMPORTANT: the sequence must be sharded ring-major, i.e. with
    ``PartitionSpec(None, ("sp_r", "sp_u"))``: device (u, r) holds global
    chunk r*U + u.  The ulysses all-to-all then concatenates the U chunks
    {r*U + u} into the CONTIGUOUS range [r * S/R, (r+1) * S/R), which is
    exactly the contiguous ring shard ring_attention's causal
    step-skipping assumes.  After the all-to-all each device holds
    (B, S / ring, H / ulysses, D) and ring attention completes the job.
    """
    u = jax.lax.axis_size(ulysses_axis)

    def scatter_heads(x):
        if u == 1:
            return x
        return jax.lax.all_to_all(x, ulysses_axis, split_axis=2, concat_axis=1, tiled=True)

    def gather_heads(x):
        if u == 1:
            return x
        return jax.lax.all_to_all(x, ulysses_axis, split_axis=1, concat_axis=2, tiled=True)

    qg, kg, vg = scatter_heads(q), scatter_heads(k), scatter_heads(v)
    seg = segment_ids
    if segment_ids is not None and u > 1:
        seg = jax.lax.all_gather(segment_ids, ulysses_axis, axis=1, tiled=True)

    out = ring_attention(qg, kg, vg, segment_ids=seg, axis_name=ring_axis)
    return gather_heads(out)
