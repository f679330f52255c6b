"""Direct Preference Optimization trainer pieces.

The reference imports a vendored TRL DPOTrainer (llava/train/train.py:54,
llava_trainer.py:34 — the llava/trl directory is absent from the
snapshot, SURVEY.md S2.6).  This module supplies the DPO loss and step
natively: sigmoid-DPO over (chosen, rejected) pairs against a frozen
reference model, with the policy's multimodal forward reused as-is.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from spatialrgpt_tpu.config import SpatialRGPTConfig
from spatialrgpt_tpu.constants import IGNORE_INDEX
from spatialrgpt_tpu.models import vlm


def sequence_logprob(params, cfg: SpatialRGPTConfig, inputs: vlm.VLMInputs, attn_impl="xla"):
    """Sum of per-token logprobs over supervised (non-IGNORE) targets."""
    logits = vlm.forward(params, cfg, inputs, attn_impl=attn_impl)
    tgt = inputs.labels[:, 1:]
    seg_ok = inputs.segment_ids[:, 1:] == inputs.segment_ids[:, :-1]
    valid = (tgt != IGNORE_INDEX) & (inputs.segment_ids[:, 1:] != 0) & seg_ok
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(logp, jnp.where(valid, tgt, 0)[..., None], axis=-1)[..., 0]
    return (tok * valid).sum(axis=-1)  # (B,)


def dpo_loss(
    policy_params,
    ref_params,
    cfg: SpatialRGPTConfig,
    chosen: vlm.VLMInputs,
    rejected: vlm.VLMInputs,
    beta: float = 0.1,
    attn_impl: str = "xla",
) -> Tuple[jax.Array, Dict]:
    """sigmoid DPO: -log σ(β [(π_c - π_r) - (ref_c - ref_r)])."""
    pol_c = sequence_logprob(policy_params, cfg, chosen, attn_impl)
    pol_r = sequence_logprob(policy_params, cfg, rejected, attn_impl)
    ref_c = jax.lax.stop_gradient(sequence_logprob(ref_params, cfg, chosen, attn_impl))
    ref_r = jax.lax.stop_gradient(sequence_logprob(ref_params, cfg, rejected, attn_impl))

    logits = beta * ((pol_c - pol_r) - (ref_c - ref_r))
    loss = -jax.nn.log_sigmoid(logits).mean()
    reward_acc = (logits > 0).mean()
    return loss, {
        "dpo_loss": loss,
        "reward_accuracy": reward_acc,
        "chosen_reward": (beta * (pol_c - ref_c)).mean(),
        "rejected_reward": (beta * (pol_r - ref_r)).mean(),
    }


class DPOState(NamedTuple):
    step: jax.Array
    params: Dict
    ref_params: Dict
    opt_state: Dict


def make_dpo_step(cfg: SpatialRGPTConfig, optimizer, beta: float = 0.1, attn_impl="xla"):
    @jax.jit
    def step(state: DPOState, chosen: vlm.VLMInputs, rejected: vlm.VLMInputs):
        def loss_fn(p):
            return dpo_loss(p, state.ref_params, cfg, chosen, rejected, beta, attn_impl)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return DPOState(state.step + 1, new_params, state.ref_params, new_opt), metrics

    return step
