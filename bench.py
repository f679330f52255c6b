"""End-to-end region-QA serving benchmark (driver contract).

Measures the BASELINE.json north-star on the Sheared-3B flagship config
(config 1): batched SpatialRGPT-Bench-style region QA — RGB image + depth
map through the SigLIP tower, region extraction for box regions, prompt
prefill, and greedy decode — end to end on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": tokens/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline is measured against A100_BASELINE_TOK_S, an estimate of the
PyTorch reference's per-A100 end-to-end generation throughput at the same
batch size (HF generate + flash-attn 2, batch 8, 2.7B bf16).  The repo
publishes no numbers (BASELINE.md), so this constant documents our
assumption until a measured reference lands; the target in BASELINE.json
is 2x this value per v5e chip (vs_baseline >= 2 means target met).
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

A100_BASELINE_TOK_S = 700.0  # est. reference throughput (batch 32, A100, HF generate)

# Default = the BASELINE.json north-star config: the Llama3-8B flagship.
# Batch 96 amortizes the 8 GB int8 weight stream across more decode rows
# (decode is the HBM floor): 1481.9 tok/s vs 1390.3 at b64 (BASELINE.md;
# b64 keeps the lower 2.1 s TTFT when latency matters).
# The Sheared-3B config (BASELINE.md numbers) via SRGPT_BENCH_MODEL=sheared-3b.
MODEL = os.environ.get("SRGPT_BENCH_MODEL", "llama3-8b")
BATCH = int(os.environ.get("SRGPT_BENCH_BATCH", 96))
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


def fast_init_quantized(cfg, w8a8: bool, seed: int = 0):
    """On-device init directly into the quantized layout.

    The bench serves random weights (throughput doesn't depend on values).
    The original path — init bf16 on host, quantize on host, device_put —
    spent ~30 min for llama3-8b, dominated by shipping ~10 GB through the
    tunneled device transport (BASELINE.md).  Instead, build the
    ops/quant.py int8 layout directly on the TPU inside one jit: 2D
    kernels in llm/vision become {"q": randint int8, "scale": (1, out)
    f32} (+ "a8" marker per quantize_llm's in<=out rule when w8a8),
    everything else bf16 normals.  bf16 never occupies HBM for quantized
    kernels, and nothing crosses the host link.
    """
    shapes = jax.eval_shape(
        lambda: vlm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    )
    counter = [0]

    def build(base):
        def nextkey():
            counter[0] += 1
            return jax.random.fold_in(base, counter[0])

        def dense_leaf(sd):
            scale = sd.shape[0] ** -0.5 if len(sd.shape) == 2 else 0.02
            return (jax.random.normal(nextkey(), sd.shape, jnp.float32) * scale).astype(
                sd.dtype
            )

        def visit(node, quantize):
            if isinstance(node, dict):
                if (
                    quantize
                    and "kernel" in node
                    and getattr(node["kernel"], "ndim", 0) == 2
                ):
                    din, dout = node["kernel"].shape
                    kq = {
                        "q": jax.random.randint(
                            nextkey(), (din, dout), -127, 128, jnp.int8
                        ),
                        "scale": jnp.full(
                            (1, dout), din**-0.5 * 3.0 / 127.0, jnp.float32
                        ),
                    }
                    if w8a8:
                        # linear() gates the int8-activation path by shape
                        # (expanding kernels always, contracting at large M)
                        kq["a8"] = np.zeros((), np.bool_)
                    out = {
                        k: visit(v, quantize) for k, v in node.items() if k != "kernel"
                    }
                    out["kernel_q"] = kq
                    return out
                return {k: visit(v, quantize) for k, v in node.items()}
            if isinstance(node, list):
                return [visit(v, quantize) for v in node]
            return dense_leaf(node)

        return {
            k: visit(v, quantize=(k == "llm" or (w8a8 and k == "vision")))
            for k, v in shapes.items()
        }

    return jax.jit(build)(jax.random.PRNGKey(seed))


def build_batch(cfg, rng):
    rows = []
    for b in range(BATCH):
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
        images=jnp.asarray(rng.standard_normal((BATCH, size, size, 3)), dtype),
        depths=jnp.asarray(rng.standard_normal((BATCH, size, size, 3)), dtype),
        masks=jnp.asarray((rng.random((BATCH, N_REGIONS, size, size)) > 0.5), dtype),
        mask_valid=jnp.ones((BATCH, N_REGIONS), bool),
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

    inputs, prompt_lengths = build_batch(cfg, rng)

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

    total_new_tokens = BATCH * MAX_NEW  # greedy on random weights rarely hits EOS
    tok_s = total_new_tokens / wall

    # TTFT: prefill-only latency (image encode + splice + prefill + 1st token)
    # measured by a generate with max_new_tokens=1
    run1 = lambda: generate(
        params, cfg, inputs, prompt_lengths, max_new_tokens=1, temperature=0.0,
        eos_token_id=-1,
        attn_impl=attn,
        kv_quant=kv_quant,
        kv_bits=kv_bits,
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

    print(
        json.dumps(
            {
                "metric": f"region-qa tokens/sec/chip ({MODEL}, batch {BATCH}, 2 regions, RGB+depth)",
                "value": round(tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / A100_BASELINE_TOK_S, 3),
                "ttft_p50_s": round(ttft_p50, 4),
                "e2e_batch_s": round(wall, 4),
                "compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
                **stages,
            }
        )
    )


if __name__ == "__main__":
    main()
