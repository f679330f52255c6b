"""Device mesh construction and sharding rules.

Replaces the reference's ProcessGroupManager + NCCL groups
(llava/train/sequence_parallel/globals.py:21-158) and DeepSpeed ZeRO/MiCS
partitioning (SURVEY.md S2.9): one ``jax.sharding.Mesh`` with axes

  dp    data parallel (across slices / DCN when multi-slice)
  fsdp  parameter/optimizer sharding (ZeRO-3 equivalent, ICI)
  sp    sequence parallel (Ulysses/ring, ICI)
  tp    tensor parallel (reserved; the reference has no real TP)

ZeRO-2/3 and MiCS's hierarchical gathers disappear into pjit sharding
rules: parameters and optimizer state are sharded over ``fsdp`` and XLA
inserts the (hierarchical, ICI-aware) all-gathers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "sp", "tp")


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    sp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * fsdp * sp * tp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{sp}x{tp} needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, sp, tp)
    return Mesh(arr, AXES)


def make_hybrid_mesh(
    dp: int = 1,
    fsdp: int = 1,
    sp_ulysses: int = 1,
    sp_ring: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh for 2D hybrid sequence parallelism: the sp factor splits into
    separate ulysses and ring axes (the reference's
    --seq_parallel_size x --seq_parallel_ring_size, globals.py:62-115).
    Sequence arrays shard ring-major: PartitionSpec(None, ("sp_r", "sp_u"))
    (see parallel/hybrid.py's layout contract)."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * fsdp * sp_ulysses * sp_ring
    if need > len(devices):
        raise ValueError(f"hybrid mesh needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, fsdp, sp_ulysses, sp_ring)
    return Mesh(arr, ("dp", "fsdp", "sp_u", "sp_r"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1, 1)


# ---------------------------------------------------------------------------
# Parameter sharding rules (ZeRO-equivalent)
# ---------------------------------------------------------------------------


def param_spec(path: str, shape: tuple) -> P:
    """FSDP rule: shard the largest dim of every big matrix over 'fsdp',
    prefer the embedding/vocab dim and MLP fan-out so all-gathers ride ICI
    with contiguous layouts.  Small vectors (norms, biases) replicate."""
    if len(shape) < 2 or max(shape) < 1024:
        return P()
    # shard the last dim for kernels (fan-out), first for embeddings
    if "embed_tokens" in path or "pos_embed" in path:
        return P("fsdp", None)
    if shape[-1] >= shape[0]:
        return P(*([None] * (len(shape) - 1) + ["fsdp"]))
    return P(*(["fsdp"] + [None] * (len(shape) - 1)))


def _path_name_tokens(path: str) -> set:
    import re

    return set(t for t in re.split(r"[^A-Za-z0-9_]+", path) if t)


def tp_param_spec(path: str, shape: tuple) -> P:
    """Megatron-style tensor-parallel rule for the decoder (serving).

    QKV and MLP gate/up kernels shard their fan-out (head/neuron) dim over
    'tp'; wo and down shard fan-in, so each block's output is a partial sum
    and GSPMD inserts exactly one all-reduce per attention/MLP block — the
    textbook 2-collectives-per-layer TP schedule, over ICI.  lm_head
    shards the vocab (logits all-gather per step is small).  Embeddings,
    norms, and biases replicate.  The reference has only vestigial TP
    (SURVEY.md §2.7: HF pretraining_tp slicing, no comm groups); this is
    the real thing, natively on the mesh.
    """
    toks = _path_name_tokens(path)
    if "experts_stacked" in toks and len(shape) == 3:
        # stacked MoE experts (E, fi, fo): shard each expert's neurons over
        # tp (partial-sum + one all-reduce, same as the dense MLP rule) —
        # validated to match the replicated sparse path under GSPMD
        if toks & {"gate", "up"}:
            return P(None, None, "tp")
        return P(None, "tp", None)
    if len(shape) != 2:
        return P()
    if toks & {"wq", "wk", "wv", "gate", "up"}:
        return P(None, "tp")
    if toks & {"wo", "down"}:
        return P("tp", None)
    if "lm_head" in toks:
        return P(None, "tp")
    return P()


def tp_shard_params(params, mesh: Mesh):
    """Place a composite VLM param tree for tensor-parallel serving: the
    'llm' subtree shards per tp_param_spec, everything else (vision tower,
    projector, region extractor — compute-bound, batch-parallel) replicates.

    Works on quantized trees too: kernel_q entries {'q': (fi, fo) int8,
    'scale': (1, fo)} shard like their kernel would.
    """

    def _place(path, x):
        shape = x.shape
        # quantized kernels: the int8 payload shards like the kernel; the
        # (1, fo) scale follows the fan-out dim
        if "kernel_q" in path and "scale" in path and len(shape) == 2:
            kernel_spec = tp_param_spec(path, shape)
            spec = P(None, kernel_spec[1] if len(kernel_spec) > 1 else None)
        else:
            spec = tp_param_spec(path, shape)
        return jax.device_put(x, NamedSharding(mesh, spec))

    placed = dict(params)
    placed["llm"] = _tree_map_with_path(_place, params["llm"])
    rep = NamedSharding(mesh, P())
    for k in params:
        if k != "llm":
            placed[k] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), params[k]
            )
    return placed


def shard_params(params, mesh: Mesh):
    """Apply param_spec over a pytree and device_put with NamedSharding."""

    def _place(path, x):
        spec = param_spec(path, x.shape)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return _tree_map_with_path(_place, params)


def param_sharding_tree(params, mesh: Mesh):
    def _spec(path, x):
        return NamedSharding(mesh, param_spec(path, x.shape))

    return _tree_map_with_path(_spec, params)


def batch_spec(mesh: Optional[Mesh] = None) -> P:
    """Activations: batch over (dp, fsdp) combined, sequence over the sp
    axis/axes present in the mesh (ring-major for hybrid)."""
    if mesh is not None and "sp_u" in mesh.shape:
        return P(("dp", "fsdp"), ("sp_r", "sp_u"))
    return P(("dp", "fsdp"), "sp")


def _tree_map_with_path(fn, tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        path_str = "/".join(str(p) for p in path)
        out.append(fn(path_str, leaf))
    return jax.tree_util.tree_unflatten(treedef, out)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (the torchrun + NCCL rendezvous
    equivalent, reference scripts/srgpt/*/1_mm_align.sh:3-22 +
    globals.py:138).  On Cloud TPU pods jax.distributed discovers the
    topology from the metadata/env; explicit args cover SLURM-style
    launches (SLURM_* env fallbacks applied)."""
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
    if process_id is None and "SLURM_PROCID" in os.environ:
        process_id = int(os.environ["SLURM_PROCID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def data_parallel_rank(mesh: Mesh) -> int:
    """This process's data-parallel rank for the sampler (multi-host)."""
    return jax.process_index()


def data_parallel_world(mesh: Mesh) -> int:
    return jax.process_count()
