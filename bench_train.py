"""Training-step throughput benchmark (single chip).

Measures the stage-1-style alignment step of the reference recipe
(scripts/srgpt/sheared_3b/1_mm_align.sh: frozen LLM + frozen vision tower,
tuned mm_projector + region extractor, bf16, grad checkpointing,
model_max_length 4096) on region-QA-shaped packed data: rows of
model_max_length tokens, each packing SAMPLES_PER_ROW samples of
1 image (196 tokens) + 2 box regions (<mask><depth>) + text, RGB and
depth both encoded by the tower.

The full-SFT (all-modules AdamW) step needs the optimizer state sharded
over an fsdp mesh axis (run via train/train.py on a pod slice; validated
by __graft_entry__.dryrun_multichip) — AdamW moments for a 2.7B model
alone exceed one v5e chip's HBM, so the single-chip benchmark is the
align stage, which is also the reference's single-node-friendly config.

Prints ONE JSON line: {"metric": ..., "value": tokens/sec/chip, ...}.

Env knobs: SRGPT_TRAIN_BENCH_MODEL (sheared-3b), SRGPT_TRAIN_BENCH_BATCH
(rows), SRGPT_TRAIN_BENCH_SEQ (tokens/row), SRGPT_TRAIN_BENCH_REMAT (1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.config import preset
from spatialrgpt_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, NUM_TOKENS_PER_IMAGE
from spatialrgpt_tpu.data.splice import expand_rows, pack_rows
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.train.optimizer import OptimizerConfig, build_optimizer
from spatialrgpt_tpu.train.step import create_train_state, make_train_step
from spatialrgpt_tpu.utils.timing import device_sync, time_fn

MODEL = os.environ.get("SRGPT_TRAIN_BENCH_MODEL", "sheared-3b")
STAGE = os.environ.get("SRGPT_TRAIN_BENCH_STAGE", "align")  # align | qlora
BATCH = int(os.environ.get("SRGPT_TRAIN_BENCH_BATCH", 4))
SEQ = int(os.environ.get("SRGPT_TRAIN_BENCH_SEQ", 4096))
REMAT = os.environ.get("SRGPT_TRAIN_BENCH_REMAT", "1") == "1"
CE_CHUNK = int(os.environ.get("SRGPT_TRAIN_BENCH_CE_CHUNK", 1024))  # 0 = unchunked
_QUANT_ENV = os.environ.get("SRGPT_TRAIN_BENCH_QUANT", "0")
QUANT = _QUANT_ENV in ("1", "2")  # W8A8 frozen backbone
QUANT_BWD8 = _QUANT_ENV == "2"  # + int8 dx backward (SwitchBack-style)
N_REGIONS = 2
SAMPLES_PER_ROW = 4


def build_batch(cfg, rng):
    """BATCH packed rows of <= SEQ tokens, SAMPLES_PER_ROW samples each."""
    text_len = SEQ // SAMPLES_PER_ROW - NUM_TOKENS_PER_IMAGE - 2 * N_REGIONS - 8
    singles = []
    for _ in range(BATCH * SAMPLES_PER_ROW):
        ids = (
            [1, IMAGE_TOKEN_INDEX]
            + [cfg.mask_token_id, cfg.depth_token_id] * N_REGIONS
            + list(rng.integers(10, 1000, text_len))
        )
        labs = [IGNORE_INDEX] * (2 + 2 * N_REGIONS) + list(ids[2 + 2 * N_REGIONS :])
        sb = expand_rows(
            [np.asarray(ids, np.int64)],
            [np.asarray(labs, np.int64)],
            max_len=SEQ,
            tokens_per_image=NUM_TOKENS_PER_IMAGE,
            mask_token_id=cfg.mask_token_id,
            depth_token_id=cfg.depth_token_id,
            regions_per_image=N_REGIONS,
        )
        singles.append(sb)
    sb = pack_rows(singles, max_len=SEQ)
    assert sb.input_ids.shape[0] == BATCH, sb.input_ids.shape

    n_images = BATCH * SAMPLES_PER_ROW
    size = cfg.vision.image_size
    dtype = jnp.bfloat16
    return vlm.VLMInputs(
        input_ids=jnp.asarray(sb.input_ids),
        is_image=jnp.asarray(sb.is_image),
        image_gather_idx=jnp.asarray(sb.image_gather_idx),
        position_ids=jnp.asarray(sb.position_ids),
        segment_ids=jnp.asarray(sb.segment_ids),
        labels=jnp.asarray(sb.labels),
        mask_slot=jnp.asarray(sb.mask_slot),
        is_mask=jnp.asarray(sb.is_mask),
        depth_slot=jnp.asarray(sb.depth_slot),
        is_depth=jnp.asarray(sb.is_depth),
        images=jnp.asarray(rng.standard_normal((n_images, size, size, 3)), dtype),
        depths=jnp.asarray(rng.standard_normal((n_images, size, size, 3)), dtype),
        masks=jnp.asarray((rng.random((n_images, N_REGIONS, size, size)) > 0.5), dtype),
        mask_valid=jnp.ones((n_images, N_REGIONS), bool),
    )


def main():
    cfg = preset(MODEL)
    cfg = cfg.replace(
        mask_token_id=cfg.llm.vocab_size,
        depth_token_id=cfg.llm.vocab_size + 1,
        num_extra_tokens=8,
        model_max_length=max(SEQ, cfg.model_max_length),
    )
    rng = np.random.default_rng(0)

    # 8B QLoRA: the bf16 tree alone is 16 GB on a 16 GB chip — it OOMs
    # before quantize_llm can run.  Init straight into the weight-only
    # int8 layout on device (same tree shape quantize_llm(bits=8)
    # produces; bf16 never occupies HBM for quantized kernels).
    big_quant_init = STAGE == "qlora" and (
        "8b" in MODEL or "7b" in MODEL
        or os.environ.get("SRGPT_TRAIN_BENCH_FAST_INIT") == "1"
    )
    t0 = time.time()
    if big_quant_init:
        from spatialrgpt_tpu.utils.fast_init import fast_init_quantized

        params = None
        qbase = fast_init_quantized(cfg, w8a8=False, vision_quant=False)
        device_sync(qbase["llm"]["final_ln"])
    else:
        params = vlm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        device_sync(params["llm"]["final_ln"])
    init_s = time.time() - t0

    # Pallas flash attention (fwd+bwd): the XLA path materializes the
    # (B, H, S, S) score matrices in the backward — 2x 5 GB at S=4096 —
    # while flash streams KV blocks (this is where its S^2 win applies,
    # unlike the 384-token serving prefill where XLA wins, BASELINE.md).
    attn = os.environ.get("SRGPT_TRAIN_BENCH_ATTN", "pallas")

    if STAGE == "qlora":
        # QLoRA SFT (reference train.py:401-421 + 550-589): int8 base,
        # LoRA adapters on all decoder projections + co-trained
        # projector/region — the single-chip way to *finetune through the
        # decoder* (full-SFT AdamW moments alone exceed one chip's HBM).
        from spatialrgpt_tpu.ops.quant import quantize_llm
        from spatialrgpt_tpu.train.lora import LoraConfig, init_lora
        from spatialrgpt_tpu.train.step import make_lora_train_step

        lcfg = LoraConfig(r=64, alpha=16.0)
        if big_quant_init:
            base = qbase
        else:
            base = dict(params)
            base["llm"] = quantize_llm(base["llm"], bits=8)
        # Adapter dtype: f32 default; the 8B single-chip row uses bf16
        # (the adapters' compute dtype either way — linear() casts them
        # to x.dtype in the side branch) so the 4x {param, grad, mu, nu}
        # footprint (~2.7 GB f32 at r=64 on 8B) halves.  Real SFT runs
        # shard f32 state over an fsdp axis (train/train.py).
        adtype = jnp.bfloat16 if os.environ.get(
            "SRGPT_TRAIN_BENCH_ADAPTER_DTYPE", "f32" if not big_quant_init else "bf16"
        ) == "bf16" else jnp.float32
        adapters = init_lora(jax.random.PRNGKey(1), base["llm"], lcfg, dtype=adtype)
        trainable = {
            "adapters": adapters,
            "projector": base.pop("projector"),
            "region": base.pop("region"),
        }
        # drop the bf16 decoder: params["llm"] would otherwise keep the
        # 5.4 GB bf16 tree alive next to the int8 base through the whole
        # step (the r4 qlora OOM; the align QUANT branch does the same)
        del params
        jax.block_until_ready(base["llm"]["final_ln"])
        ocfg = OptimizerConfig(learning_rate=2e-5, total_steps=100)
        optimizer = build_optimizer(trainable, ocfg)
        state = create_train_state(trainable, optimizer)
        lora_step = make_lora_train_step(cfg, optimizer, lcfg, attn_impl=attn, remat=REMAT, ce_chunk=CE_CHUNK)
        step_fn = lambda s, b: lora_step(s, base, b)
    else:
        # stage-1 align: freeze llm + vision tower, tune projector (+ region), lr 1e-3
        ocfg = OptimizerConfig(
            learning_rate=1e-3,
            tune_language_model=False,
            tune_vision_tower=False,
            tune_mm_projector=True,
            tune_region_extractor=True,
            total_steps=100,
        )
        if QUANT:  # W8A8 frozen backbone (QLoRA-style treatment of the
            # align stage): the frozen decoder+towers run on the int8 MXU
            # path fwd + remat-recompute; dX flows via the STE backward
            # (ops/layers._w8a8_dot). SRGPT_TRAIN_BENCH_QUANT=1.
            from spatialrgpt_tpu.ops.quant import quantize_llm
            from spatialrgpt_tpu.train.step import make_frozen_base_train_step

            if QUANT_BWD8:
                from spatialrgpt_tpu.ops.layers import enable_int8_backward

                enable_int8_backward(True)
            base = dict(params)
            trainable = {
                "projector": base.pop("projector"),
                "region": base.pop("region"),
            }
            base["llm"] = quantize_llm(base["llm"], act_quant=True)
            base["vision"] = quantize_llm(base["vision"], act_quant=True)
            # drop the bf16 backbone: params["llm"/"vision"] would otherwise
            # keep the 6.3 GB bf16 tree alive next to the int8 copy -> OOM
            del params
            jax.block_until_ready(base["llm"]["final_ln"])
            optimizer = build_optimizer(trainable, ocfg)
            state = create_train_state(trainable, optimizer)
            frozen_step = make_frozen_base_train_step(
                cfg, optimizer, attn_impl=attn, remat=REMAT, donate=True,
                ce_chunk=CE_CHUNK,
            )
            step_fn = lambda s, b: frozen_step(s, base, b)
        else:
            optimizer = build_optimizer(params, ocfg)
            state = create_train_state(params, optimizer)
            step_fn = make_train_step(
                cfg, optimizer, attn_impl=attn, remat=REMAT, frozen=("llm", "vision"),
                donate=True, ce_chunk=CE_CHUNK,
            )
    batch = build_batch(cfg, rng)

    t0 = time.time()
    state, metrics = step_fn(state, batch)
    device_sync(metrics["loss"])
    compile_s = time.time() - t0

    def run(state):
        state, m = step_fn(state, batch)
        return state

    # timed: dispatch N steps back-to-back, sync once
    iters = 8
    for _ in range(2):
        state = run(state)
    device_sync(state.params["projector"])
    t0 = time.time()
    for _ in range(iters):
        state = run(state)
    device_sync(state.params["projector"])
    step_s = (time.time() - t0) / iters

    stages = {}
    if os.environ.get("SRGPT_TRAIN_BENCH_STAGES") == "1" and STAGE == "align":
        # decompose the step: tower/region/splice fwd, full fwd loss;
        # bwd+opt is the remainder (optimizer is projector+region only)
        full = {**base, **state.params} if QUANT else state.params
        embed_fn = jax.jit(lambda p, b: vlm.prepare_embeds(p, cfg, b))
        e = embed_fn(full, batch)
        device_sync(e)
        stages["prepare_embeds_s"] = round(
            time_fn(lambda: embed_fn(full, batch), iters=3, warmup=1), 4
        )
        fwd_fn = jax.jit(
            lambda p, b: vlm.loss_fn(p, cfg, b, attn_impl=attn, ce_chunk=CE_CHUNK)[0]
        )
        l = fwd_fn(full, batch)
        device_sync(l)
        stages["fwd_loss_s"] = round(
            time_fn(lambda: fwd_fn(full, batch), iters=3, warmup=1), 4
        )
        stages["bwd_opt_s"] = round(step_s - stages["fwd_loss_s"], 4)

    tokens = BATCH * SEQ
    tok_s = tokens / step_s
    # MFU estimate: frozen-llm step ~= fwd(2NT) + activation-bwd(2NT) on
    # the decoder + ViT fwd x2 towers (backward into frozen towers is DCEd)
    n_llm = 2.7e9 if "3b" in MODEL else 8.0e9
    flops = 4 * n_llm * tokens + 2 * 0.43e9 * 768 * BATCH * SAMPLES_PER_ROW * 2
    mfu = flops / step_s / 197e12

    print(
        json.dumps(
            {
                "metric": f"{STAGE}-step tokens/sec/chip ({MODEL}, batch {BATCH}x{SEQ}, "
                f"{SAMPLES_PER_ROW} samples/row, RGB+depth, 2 regions"
                + ((", w8a8 frozen backbone" + (" + int8 bwd" if QUANT_BWD8 else "")) if QUANT else "") + ")",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "step_s": round(step_s, 4),
                "mfu_est": round(mfu, 3),
                "loss": float(metrics["loss"]),
                "compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
                **stages,
            }
        )
    )


if __name__ == "__main__":
    main()
