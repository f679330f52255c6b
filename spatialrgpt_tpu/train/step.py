"""Sharded training step.

Replaces the reference's HF-Trainer + DeepSpeed loop (llava/train/train.py
+ llava_trainer.py + ZeRO): one jitted function computing
grad(loss) -> clipped AdamW update, with

  - parameters and optimizer state sharded over the ``fsdp`` mesh axis
    (ZeRO-3 equivalent; XLA inserts the hierarchical all-gathers that
    MiCS hand-rolls, deepspeed_replace/runtime/zero/mics.py:255-326),
  - batch sharded over ``dp`` (+``fsdp``), sequence over ``sp``,
  - gradient psums handled automatically by pjit,
  - optional sequence-parallel attention via the ambient SPContext.

The loss (models/vlm.py:loss_fn) already normalizes by the number of valid
target tokens across the whole global batch, which reproduces the
reference's SP loss-rescale semantics (llava/train/utils.py:141-246:
weight by valid tokens, not by rank) without any manual resharding.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatialrgpt_tpu.config import SpatialRGPTConfig
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def batch_shardings(mesh: Mesh, inputs: vlm.VLMInputs) -> vlm.VLMInputs:
    """NamedShardings for a VLMInputs batch: (B, S) arrays over
    (dp, sp); image tensors over dp on their leading axis."""
    seq_axes = ("sp_r", "sp_u") if "sp_u" in mesh.shape else "sp"
    bs = NamedSharding(mesh, P(("dp", "fsdp"), seq_axes))
    b_only = NamedSharding(mesh, P(("dp", "fsdp")))
    rep = NamedSharding(mesh, P())

    def pick(name, x):
        if x is None:
            return None
        if x.ndim >= 2 and name in (
            "input_ids", "is_image", "image_gather_idx", "position_ids",
            "segment_ids", "labels", "mask_slot", "is_mask", "depth_slot", "is_depth",
        ):
            return bs
        if name in ("images", "depths", "masks", "mask_valid"):
            return b_only
        return rep

    return vlm.VLMInputs(
        **{k: pick(k, getattr(inputs, k)) for k in inputs._fields}
    )


def make_train_step(
    cfg: SpatialRGPTConfig,
    optimizer: optax.GradientTransformation,
    attn_impl: str = "xla",
    remat: bool = False,
    frozen: Tuple[str, ...] = (),
    donate: bool = False,
    ce_chunk: int = 0,
):
    """Build the jitted train step.  Shardings come from the arrays
    themselves (jit propagates NamedShardings), so the same step works on
    1 device or a full mesh.  ``remat`` enables per-layer gradient
    checkpointing; gradient accumulation wraps the optimizer with
    optax.MultiSteps (see train/train.py)."""

    def loss_fn(params, batch: vlm.VLMInputs):
        # stop_gradient on frozen submodules (the optimizer already
        # set_to_zero's them): XLA then dead-code-eliminates their weight
        # gradients entirely — the reference freezes by requires_grad
        # (train.py:609-629), this is the compile-time equivalent. Saves
        # both the dW matmuls and the grad buffers of frozen modules
        # (5.4 GB for a frozen 3B llm in the stage-1 align).
        if frozen:
            params = {
                k: (jax.lax.stop_gradient(v) if k in frozen else v)
                for k, v in params.items()
            }
        loss, metrics = vlm.loss_fn(
            params, cfg, batch, attn_impl=attn_impl, remat=remat, ce_chunk=ce_chunk
        )
        return loss, metrics

    # donate=True: old params/opt-state buffers are reused for the update
    # output, halving train-step parameter memory (without this a 2.7B
    # single-chip align step holds params twice and OOMs). Opt-in because
    # a donated state must never be reused by the caller — the production
    # loops (train/train.py CLI, bench_train.py) rebind
    # `state = step_fn(state, batch)` and enable it.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: vlm.VLMInputs) -> Tuple[TrainState, Dict]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return train_step


def make_lora_train_step(
    cfg: SpatialRGPTConfig,
    optimizer: optax.GradientTransformation,
    lcfg,
    attn_impl: str = "xla",
    remat: bool = False,
    donate: bool = True,
    ce_chunk: int = 0,
):
    """LoRA/QLoRA step (reference train.py:550-589 lora_enable / :401-421
    4/8-bit): ``state.params`` holds the trainable tree ({"adapters": ...}
    plus any co-trained modules, e.g. projector/region — the reference's
    ``non_lora_trainables``); ``frozen`` holds the untouched base
    ({"llm": <bf16 or int8/int4-quantized>, "vision": ..., ...}).  The
    adapters merge into the base inside the loss (per-kernel transient
    under jit), so gradients flow only to the trainable tree.

    Signature: train_step(state, frozen, batch) -> (state, metrics).
    """
    from spatialrgpt_tpu.train.lora import apply_lora

    def loss_fn(trainable, frozen, batch: vlm.VLMInputs):
        frozen = jax.lax.stop_gradient(frozen)
        params = {k: v for k, v in frozen.items() if k != "llm"}
        params.update({k: v for k, v in trainable.items() if k != "adapters"})
        # side-branch application (merge=False): merged kernels would be
        # re-needed by the backward (dx = dy @ W'^T), which at 8B stashes
        # or recomputes a full bf16 decoder beside the int8 base — the
        # measured 17.3 GB OOM (BASELINE.md r5).  DoRA needs the merge.
        params["llm"] = apply_lora(
            frozen["llm"], trainable["adapters"], lcfg, merge=lcfg.use_dora
        )
        return vlm.loss_fn(
            params, cfg, batch, attn_impl=attn_impl, remat=remat, ce_chunk=ce_chunk
        )

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, frozen, batch: vlm.VLMInputs):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return train_step


def make_frozen_base_train_step(
    cfg: SpatialRGPTConfig,
    optimizer: optax.GradientTransformation,
    attn_impl: str = "xla",
    remat: bool = False,
    donate: bool = True,
    ce_chunk: int = 0,
):
    """Align-style step over a *materially* frozen base: ``state.params``
    holds only the trainable modules (projector/region in the stage-1
    align, reference train.py:609-629 tune_mm_mlp_adapter); ``frozen``
    holds everything else — including int8/W8A8-quantized decoders and
    towers (ops/quant.quantize_llm(act_quant=True)), whose integer leaves
    cannot sit inside value_and_grad's differentiated tree.

    With a W8A8 frozen decoder the forward and the remat recompute run on
    the int8 MXU path (2x bf16 peak) while dX flows through the
    straight-through backward (ops/layers._w8a8_dot) — the QLoRA-style
    memory/speed treatment applied to the align stage.

    Signature: train_step(state, frozen, batch) -> (state, metrics).
    """

    def loss_fn(trainable, frozen, batch: vlm.VLMInputs):
        params = dict(jax.lax.stop_gradient(frozen))
        params.update(trainable)
        return vlm.loss_fn(
            params, cfg, batch, attn_impl=attn_impl, remat=remat, ce_chunk=ce_chunk
        )

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, frozen, batch: vlm.VLMInputs):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return train_step


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place params + optimizer state with FSDP sharding over the mesh."""
    params = mesh_lib.shard_params(state.params, mesh)
    p_tree = mesh_lib.param_sharding_tree(state.params, mesh)

    def opt_place(x):
        # moments share the param tree structure where array shapes match
        return x

    # optimizer state: shard any leaf whose shape matches a param leaf
    shape_to_sharding = {}
    for leaf, sh in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(p_tree)
    ):
        shape_to_sharding.setdefault(leaf.shape, sh)

    def place_opt(x):
        if hasattr(x, "shape") and x.shape in shape_to_sharding:
            return jax.device_put(x, shape_to_sharding[x.shape])
        return jax.device_put(x, NamedSharding(mesh, P()))

    opt_state = jax.tree_util.tree_map(place_opt, state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(step, params, opt_state)
