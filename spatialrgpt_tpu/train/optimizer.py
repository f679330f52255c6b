"""Optimizer construction: per-module learning rates and freeze flags.

Mirrors the reference's trainer semantics:
  - tunable-module freezing via ``tune_language_model /
    tune_vision_tower / tune_mm_projector / tune_region_extractor``
    (llava/train/train.py:609-629, args.py:70-73),
  - separate ``mm_projector_lr`` parameter group
    (llava/train/llava_trainer.py:512-609),
  - AdamW + cosine schedule with warmup ratio (the reference uses HF
    Trainer defaults with --warmup_ratio 0.03 --lr_scheduler_type cosine).

Implemented as ``optax.multi_transform`` over parameter labels derived
from the top-level module each parameter belongs to.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import optax


@dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None  # defaults to learning_rate
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    lr_scheduler: str = "cosine"  # cosine | linear | constant
    max_grad_norm: float = 1.0
    tune_language_model: bool = True
    tune_vision_tower: bool = False
    tune_mm_projector: bool = True
    tune_region_extractor: bool = True
    # skip updates whose grads contain non-finite values (bf16 training
    # guard; replaces DeepSpeed's loss-scale skip behavior)
    skip_nonfinite_updates: int = 0  # 0 = off; else max consecutive skips


def _schedule(ocfg: OptimizerConfig, peak_lr: float) -> optax.Schedule:
    warmup = max(int(ocfg.warmup_ratio * ocfg.total_steps), 0)
    if ocfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, peak_lr, warmup, max(ocfg.total_steps, warmup + 1), end_value=0.0
        )
    if ocfg.lr_scheduler == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, peak_lr, max(warmup, 1)),
                optax.linear_schedule(peak_lr, 0.0, max(ocfg.total_steps - warmup, 1)),
            ],
            [warmup],
        )
    return lambda step: peak_lr


def param_labels(params) -> dict:
    """Label each parameter by its top-level module (llm / vision /
    projector / region), marking frozen modules as 'frozen'."""

    def label_tree(tree, label):
        return jax.tree_util.tree_map(lambda _: label, tree)

    return {k: label_tree(v, k) for k, v in params.items()}


def build_optimizer(params, ocfg: OptimizerConfig) -> optax.GradientTransformation:
    proj_lr = ocfg.mm_projector_lr or ocfg.learning_rate

    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(ocfg.max_grad_norm),
            optax.adamw(
                _schedule(ocfg, lr),
                b1=ocfg.adam_b1,
                b2=ocfg.adam_b2,
                eps=ocfg.adam_eps,
                weight_decay=ocfg.weight_decay,
            ),
        )

    tx_map = {
        "llm": adamw(ocfg.learning_rate) if ocfg.tune_language_model else optax.set_to_zero(),
        "vision": adamw(ocfg.learning_rate) if ocfg.tune_vision_tower else optax.set_to_zero(),
        "projector": adamw(proj_lr) if ocfg.tune_mm_projector else optax.set_to_zero(),
        "region": adamw(ocfg.learning_rate) if ocfg.tune_region_extractor else optax.set_to_zero(),
        # LoRA/QLoRA trainable tree: adapters always train at the base lr
        "adapters": adamw(ocfg.learning_rate),
    }
    labels = param_labels(params)
    present = {k: v for k, v in tx_map.items() if k in params}
    tx = optax.multi_transform(present, labels)
    if ocfg.skip_nonfinite_updates > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=ocfg.skip_nonfinite_updates)
    return tx
