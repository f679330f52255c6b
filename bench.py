"""End-to-end region-QA serving benchmark (driver contract).

Measures the BASELINE.json north-star on the Sheared-3B flagship config
(config 1): batched SpatialRGPT-Bench-style region QA — RGB image + depth
map through the SigLIP tower, region extraction for box regions, prompt
prefill, and greedy decode — end to end on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": tokens/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline divides by a PER-MODEL derived estimate of the PyTorch
reference's own eval harness on an A100-80GB (a100_reference_protocol_tok_s
below): the reference decodes each bench question with a batch-1 HF
generate (eval_spatial.py:224-237, input_ids.unsqueeze(0)); its
data-parallel launcher shards questions across GPUs but never batches
(scripts/srgpt/eval/srgpt_bench.sh:23-49), so per-GPU throughput is the
batch-1 number.  The JSON also carries vs_a100_equal_batch — the
hard-mode ratio against a hypothetical optimally-batched HF-generate
stack at OUR batch size (a100_batched_tok_s) that the reference does not
ship.  Both derivations are pure rooflines with efficiency factors chosen
GENEROUSLY for the A100 (documented per stage below), so both ratios are
understated.  The repo publishes no measured numbers (BASELINE.md); these
replace the former single 700 tok/s 3B-only constant.

TTFT budget (BASELINE.json names p50 TTFT as co-metric): p50 <= 2.5 s.
The throughput-default batch (96) trades TTFT for tok/s; the JSON also
reports the latency-lean batch-64 config, which meets the budget, and
flags each config against it.
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
from spatialrgpt_tpu.constants import IMAGE_TOKEN_INDEX, NUM_TOKENS_PER_IMAGE
from spatialrgpt_tpu.data.splice import expand_rows
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.serving.generate import generate
from spatialrgpt_tpu.utils.timing import device_sync, time_fn

# ---------------------------------------------------------------------------
# A100 baseline derivation (per model, per batch) — BASELINE.md "A100
# denominator".  A100-80GB datasheet: 2039 GB/s HBM2e, 312 bf16 TFLOP/s.
# Efficiency factors are deliberately GENEROUS to the A100 (they understate
# our ratio): 75% of pure HBM stream for the HF decode step (our own v5e
# measurement of an XLA decode step peaked at 85% of calibrated stream;
# HF eager without CUDA graphs is typically lower), 50% MFU for the
# flash-attn2 prefill GEMM mix, 40% MFU for the HF-eager ViT towers, and
# 1.5 ms/step HF-generate python+launch overhead (public HF benchmarks
# put the eager sampling loop at 2-5 ms/step without CUDA graphs).
# ---------------------------------------------------------------------------

A100_HBM_GBS = 2039e9 * 0.75
A100_PREFILL_FLOPS = 312e12 * 0.50
A100_VIT_FLOPS = 312e12 * 0.40
A100_STEP_OVERHEAD_S = 1.5e-3
TTFT_BUDGET_P50_S = 2.5


def _param_count(cfg) -> tuple:
    """(llm_params, vision+projector+region params) from shapes only."""
    import math

    shapes = jax.eval_shape(
        lambda: vlm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    )
    count = lambda tree: sum(
        math.prod(l.shape) for l in jax.tree_util.tree_leaves(tree)
    )
    llm = count(shapes["llm"])
    rest = count({k: v for k, v in shapes.items() if k != "llm"})
    return llm, rest


def _a100_stage_times(cfg, batch, prompt_len, max_new):
    """(vision_s, prefill_s, decode_step_s) of bf16 HF generate + flash-attn2
    on one A100-80GB at the given batch (the reference stack: eval_spatial.py
    runs the model bf16 with no quantization)."""
    p_llm, p_rest = _param_count(cfg)
    l = cfg.llm
    # bf16 KV bytes per cached token (both K and V, all layers)
    kv_per_tok = 2 * l.num_hidden_layers * l.num_key_value_heads * l.head_dim * 2
    # mid-generation cache length: prompt + half the new tokens
    kv_bytes = kv_per_tok * (prompt_len + max_new // 2) * batch
    decode_step = (2 * p_llm + kv_bytes) / A100_HBM_GBS + A100_STEP_OVERHEAD_S
    prefill = 2 * p_llm * batch * prompt_len / A100_PREFILL_FLOPS
    # RGB + depth towers (2 images/sample) + projector/region extractor
    vision = 2 * p_rest * (2 * batch) * 729 / A100_VIT_FLOPS
    return vision, prefill, decode_step


def a100_batched_tok_s(cfg, batch, prompt_len, max_new) -> float:
    """Hypothetical optimally-batched HF generate at OUR batch size (the
    reference ships no batched bench path — hard-mode denominator)."""
    vision, prefill, step = _a100_stage_times(cfg, batch, prompt_len, max_new)
    e2e = vision + prefill + step * (max_new - 1)
    return batch * max_new / e2e


def a100_reference_protocol_tok_s(cfg, prompt_len, max_new) -> float:
    """The reference's own eval harness: batch-1 HF generate per bench
    question (eval_spatial.py:224 input_ids.unsqueeze(0)); the launcher
    data-parallelizes over GPUs without batching, so this is per-A100
    throughput of the stack as shipped."""
    return a100_batched_tok_s(cfg, 1, prompt_len, max_new)

# Default = the BASELINE.json north-star config: the Llama3-8B flagship.
# Batch 64 is the headline (round 4): the largest batch that meets the
# 2.5 s p50 TTFT budget — b96's TTFT is floor-bound (prefill at 96% of
# the W8A8 matmul-chain floor; BASELINE.md "TTFT budget is floor-bound").
# The b96 max-throughput row is measured alongside (`max_throughput`).
# The Sheared-3B config (BASELINE.md numbers) via SRGPT_BENCH_MODEL=sheared-3b.
MODEL = os.environ.get("SRGPT_BENCH_MODEL", "llama3-8b")
BATCH = int(os.environ.get("SRGPT_BENCH_BATCH", 64))
MAX_NEW = int(os.environ.get("SRGPT_BENCH_MAX_NEW", 64))
N_REGIONS = 2
# text tokens around the image + region tokens; raise together with
# SRGPT_BENCH_PAD for long-context serving (where the Pallas flash
# prefill overtakes XLA attention — SRGPT_BENCH_ATTN=pallas)
PROMPT_TEXT_TOKENS = int(os.environ.get("SRGPT_BENCH_PROMPT_TOKENS", 96))
# The expanded prompt (1 bos + 8 text + 196 image tokens + 4 region
# tokens + 96 question tokens = 305) buckets to 320, not 384 — the
# coarser bucket was padding away 26% of every prefill.  Production
# bucketing to the nearest 64 tokens is what the serving engine does;
# the bench uses the same rule.
PAD_BUCKET = int(os.environ.get("SRGPT_BENCH_PAD", 320))


# fast_init_quantized moved to spatialrgpt_tpu/utils/fast_init.py so the
# training bench's 8B QLoRA path can share it (the bf16 8B tree alone
# exceeds the chip; both benches must init straight into int8).
from spatialrgpt_tpu.utils.fast_init import fast_init_quantized  # noqa: E402


def build_batch(cfg, rng, batch=None):
    batch = BATCH if batch is None else batch
    rows = []
    for b in range(batch):
        ids = (
            [1]
            + list(rng.integers(10, 1000, 8))
            + [IMAGE_TOKEN_INDEX]
            + [cfg.mask_token_id, cfg.depth_token_id] * N_REGIONS
            + list(rng.integers(10, 1000, PROMPT_TEXT_TOKENS))
        )
        rows.append(np.asarray(ids, np.int64))
    # pad prompts to a fixed bucket
    sb = expand_rows(
        rows,
        None,
        max_len=cfg.model_max_length,
        tokens_per_image=NUM_TOKENS_PER_IMAGE,
        mask_token_id=cfg.mask_token_id,
        depth_token_id=cfg.depth_token_id,
        regions_per_image=N_REGIONS,
        pad_to=PAD_BUCKET,
    )
    size = cfg.vision.image_size
    dtype = jnp.bfloat16
    inputs = vlm.VLMInputs(
        input_ids=jnp.asarray(sb.input_ids),
        is_image=jnp.asarray(sb.is_image),
        image_gather_idx=jnp.asarray(sb.image_gather_idx),
        position_ids=jnp.asarray(sb.position_ids),
        segment_ids=jnp.asarray(sb.segment_ids),
        labels=None,
        mask_slot=jnp.asarray(sb.mask_slot),
        is_mask=jnp.asarray(sb.is_mask),
        depth_slot=jnp.asarray(sb.depth_slot),
        is_depth=jnp.asarray(sb.is_depth),
        images=jnp.asarray(rng.standard_normal((batch, size, size, 3)), dtype),
        depths=jnp.asarray(rng.standard_normal((batch, size, size, 3)), dtype),
        masks=jnp.asarray((rng.random((batch, N_REGIONS, size, size)) > 0.5), dtype),
        mask_valid=jnp.ones((batch, N_REGIONS), bool),
    )
    prompt_lengths = jnp.asarray(sb.segment_ids.sum(axis=1), jnp.int32)
    return inputs, prompt_lengths


def main():
    cfg = preset(MODEL)
    cfg = cfg.replace(
        mask_token_id=cfg.llm.vocab_size, depth_token_id=cfg.llm.vocab_size + 1,
        num_extra_tokens=8,
    )
    rng = np.random.default_rng(0)
    t0 = time.time()
    # W8A8 (default on): int8 weights + dynamic int8 activations on the
    # MXU for the compute-bound stages (ViT encode + prefill); decode
    # stays at the weights+KV HBM floor either way. Composable with
    # SRGPT_BENCH_INT8 (which additionally does host-side init for big
    # models). Accuracy gate: greedy tokens match bf16 exactly on the
    # test model (tests/test_generate.py::test_w8a8_generate_matches_bf16).
    # Measured: 1491 vs 1327 tok/s at batch 64 (BASELINE.md).
    w8a8 = os.environ.get("SRGPT_BENCH_W8A8", "1") == "1"
    if os.environ.get("SRGPT_BENCH_INT8") == "1" or w8a8:
        # quantized serving: init directly into the int8 layout on-device
        # in one jit — bf16 never occupies HBM for quantized kernels and
        # nothing crosses the host link (init 1819 s -> seconds for 8B,
        # BASELINE.md).  Covers both the int8-weight mode and the default
        # W8A8 mode (identical layouts; a8 markers per the w8a8 flag).
        params = fast_init_quantized(cfg, w8a8)
    else:
        params = vlm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if os.environ.get("SRGPT_BENCH_FUSED", "0") == "1":
        # fused wqkv / gate|up serving kernels (ops/quant.
        # fuse_serving_kernels) — measured as a LOSS on the 8B config
        # (1113 vs 1181 tok/s; prefill 1.79 vs 1.71 s, decode 14.1 vs
        # 12.9 ms/step): XLA already overlaps the separate projections,
        # and the fused output's q/k/v slices add layout copies.  Kept
        # as an opt-in (greedy parity tested).
        from spatialrgpt_tpu.ops.quant import fuse_serving_kernels

        params = jax.jit(fuse_serving_kernels, donate_argnums=0)(params)
    device_sync(params["llm"]["final_ln"])
    init_s = time.time() - t0

    kv_quant = os.environ.get("SRGPT_BENCH_KV_INT8", "1") == "1"
    # 8 (default, exact greedy parity) or 4 (packed nibbles — halves the
    # cache stream again; lossy, opt-in)
    kv_bits = int(os.environ.get("SRGPT_BENCH_KV_BITS", 8))
    # Short-bucket prefill attention: the one-pass kernel (whole-sequence
    # kv blocks, no HBM score tensor, no online-softmax chain) measures
    # 45.1 vs 55.6 ms/layer against XLA attention at the 8B prefill shape
    # (scripts/bench_prefill.py); XLA had been re-streaming the 1.2 GB
    # f32 score tensor through the mask/softmax chain.  The generic flash
    # kernel stays the long-context choice (SRGPT_BENCH_ATTN=pallas).
    attn = os.environ.get("SRGPT_BENCH_ATTN", "onepass")

    def measure(batch):
        inputs, prompt_lengths = build_batch(cfg, rng, batch)
        run = lambda: generate(
            params,
            cfg,
            inputs,
            prompt_lengths,
            max_new_tokens=MAX_NEW,
            temperature=0.0,
            eos_token_id=-1,  # force full-length decode for stable throughput
            attn_impl=attn,
            kv_quant=kv_quant,
            kv_bits=kv_bits,
        )
        t0 = time.time()
        result = run()
        device_sync(result.tokens)
        compile_s = time.time() - t0

        # timed runs (block_until_ready is a no-op on the tunneled platform;
        # sync via scalar fetch -- utils/timing.py)
        wall = time_fn(run, iters=3, warmup=1)
        tok_s = batch * MAX_NEW / wall  # greedy random weights rarely hit EOS

        # TTFT: prefill-only latency (image encode + splice + prefill +
        # first token) measured by a generate with max_new_tokens=1
        run1 = lambda: generate(
            params, cfg, inputs, prompt_lengths, max_new_tokens=1,
            temperature=0.0, eos_token_id=-1, attn_impl=attn,
            kv_quant=kv_quant, kv_bits=kv_bits,
        )
        r = run1()
        device_sync(r.tokens)  # compile
        ttfts = []
        for _ in range(5):
            t0 = time.time()
            r = run1()
            device_sync(r.tokens)
            ttfts.append(time.time() - t0)
        ttft_p50 = sorted(ttfts)[len(ttfts) // 2]

        stages = {}
        if os.environ.get("SRGPT_BENCH_STAGES") == "1":
            # isolate the TTFT stages: vision/region/splice vs LLM prefill
            embed_fn = jax.jit(lambda p, i: vlm.prepare_embeds(p, cfg, i))
            embeds = embed_fn(params, inputs)
            device_sync(embeds)
            stages["prepare_embeds_s"] = round(
                time_fn(lambda: embed_fn(params, inputs), iters=3, warmup=1), 4
            )
            from spatialrgpt_tpu.models import llama as llama_lib

            prefill_fn = jax.jit(
                lambda p, e: llama_lib.forward(
                    p["llm"], cfg.llm, inputs_embeds=e,
                    position_ids=inputs.position_ids,
                    segment_ids=inputs.segment_ids, attn_impl=attn,
                )[0]
            )
            h = prefill_fn(params, embeds)
            device_sync(h)
            stages["llm_prefill_s"] = round(
                time_fn(lambda: prefill_fn(params, embeds), iters=3, warmup=1), 4
            )
            stages["decode_ms_per_step"] = round(
                (wall - ttft_p50) / max(MAX_NEW - 1, 1) * 1000, 3
            )
        return {
            "tok_s": tok_s,
            "ttft_p50": ttft_p50,
            "wall": wall,
            "compile_s": compile_s,
            "stages": stages,
        }

    prompt_len = PAD_BUCKET  # prefill runs at the padded bucket
    baseline_ref = a100_reference_protocol_tok_s(cfg, prompt_len, MAX_NEW)
    m = measure(BATCH)
    out = {
        "metric": f"region-qa tokens/sec/chip ({MODEL}, batch {BATCH}, 2 regions, RGB+depth)",
        "value": round(m["tok_s"], 2),
        "unit": "tok/s",
        # denominator: the reference's own eval harness on A100 (batch-1 HF
        # generate per question — what the PyTorch stack actually does)
        "vs_baseline": round(m["tok_s"] / baseline_ref, 3),
        "a100_reference_protocol_tok_s": round(baseline_ref, 1),
        # hard mode: a hypothetical optimally-batched A100 at OUR batch
        "vs_a100_equal_batch": round(
            m["tok_s"] / a100_batched_tok_s(cfg, BATCH, prompt_len, MAX_NEW), 3
        ),
        "a100_equal_batch_tok_s": round(
            a100_batched_tok_s(cfg, BATCH, prompt_len, MAX_NEW), 1
        ),
        "ttft_p50_s": round(m["ttft_p50"], 4),
        "ttft_budget_s": TTFT_BUDGET_P50_S,
        "ttft_within_budget": m["ttft_p50"] <= TTFT_BUDGET_P50_S,
        "e2e_batch_s": round(m["wall"], 4),
        "compile_s": round(m["compile_s"], 1),
        "init_s": round(init_s, 1),
        **m["stages"],
    }

    # batch sweep in one process (shared init): SRGPT_BENCH_EXTRA_BATCHES
    # ="72,80" measures additional batch sizes and appends their rows
    extra = os.environ.get("SRGPT_BENCH_EXTRA_BATCHES", "")
    if extra:
        out["extra_batches"] = []
        for b in (int(x) for x in extra.split(",") if x):
            mb = measure(b)
            out["extra_batches"].append(
                {
                    "batch": b,
                    "tok_s": round(mb["tok_s"], 2),
                    "vs_baseline": round(mb["tok_s"] / baseline_ref, 3),
                    "ttft_p50_s": round(mb["ttft_p50"], 4),
                    "ttft_within_budget": mb["ttft_p50"] <= TTFT_BUDGET_P50_S,
                    **mb["stages"],
                }
            )

    # max-throughput config: measured alongside the (budget-passing)
    # headline so both ends of the batch/TTFT trade are recorded numbers
    # (round 4: headline b64 meets the 2.5 s budget; b96 trades TTFT for
    # tok/s).  Runs only when the batch is the stock default (explicit
    # SRGPT_BENCH_BATCH sweeps skip it); disable with SRGPT_BENCH_LEAN=0.
    mt_batch = int(os.environ.get("SRGPT_BENCH_LEAN_BATCH", 96))
    if (
        "SRGPT_BENCH_BATCH" not in os.environ
        and os.environ.get("SRGPT_BENCH_LEAN", "1") == "1"
        and mt_batch != BATCH
    ):
        ml = measure(mt_batch)
        out["max_throughput"] = {
            "batch": mt_batch,
            "tok_s": round(ml["tok_s"], 2),
            "vs_baseline": round(ml["tok_s"] / baseline_ref, 3),
            "ttft_p50_s": round(ml["ttft_p50"], 4),
            "ttft_within_budget": ml["ttft_p50"] <= TTFT_BUDGET_P50_S,
            **ml["stages"],
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
