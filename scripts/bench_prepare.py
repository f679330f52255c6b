"""Decompose prepare_embeds at the serving config (VERDICT r3 next-#1).

prepare_embeds is the largest TTFT slice (1.36 s of 3.19 s at the 8B b96
default, 0.91 s at b64 — BASELINE.md).  This script measures, on the real
chip, the stage split inside it at the bench's own shapes/params
(quantized W8A8 init, bf16 pixels):

  - tower forward over the 2N-image rgb+depth batch (the dominant slice),
  - region refinement + pooling (chunked deconv),
  - projector + splice,
  - and a ViT-attention variant sweep (block_h x block_q) measured through
    the FULL tower forward, not a kernel microbench — per-kernel timings
    through the tunnel are +-30% noise (verify skill), the 26-layer tower
    pass is not.

Run: `python scripts/bench_prepare.py [batch]` (default 64).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from spatialrgpt_tpu.config import preset
from spatialrgpt_tpu.models import siglip, vlm
from spatialrgpt_tpu.utils.timing import device_sync, time_fn

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODEL = os.environ.get("SRGPT_BENCH_MODEL", "llama3-8b")


def main():
    cfg = preset(MODEL)
    cfg = cfg.replace(
        mask_token_id=cfg.llm.vocab_size, depth_token_id=cfg.llm.vocab_size + 1,
        num_extra_tokens=8,
    )
    rng = np.random.default_rng(0)
    # SRGPT_PREP_VISION_BF16=1: keep the vision tower bf16 (no W8A8) —
    # the act-quant-chain A/B; two 8B param sets don't coexist in HBM,
    # so the comparison is two invocations of this script
    vbf16 = os.environ.get("SRGPT_PREP_VISION_BF16", "0") == "1"
    out_extra = {"vision_bf16": vbf16}
    params = bench.fast_init_quantized(cfg, w8a8=True, vision_quant=not vbf16)
    device_sync(params["llm"]["final_ln"])
    inputs, _ = bench.build_batch(cfg, rng, BATCH)

    out = {"batch": BATCH, "model": MODEL, **out_extra}

    def t(name, fn, *args):
        f = jax.jit(fn)
        r = f(*args)
        device_sync(r)
        out[name] = round(time_fn(lambda: f(*args), iters=3, warmup=1), 4)
        print(f"{name}: {out[name]}", file=sys.stderr)
        return np.asarray(jax.tree_util.tree_leaves(r)[0]).shape and r

    # full prepare (the bench's jit boundary)
    t("prepare_embeds_s", lambda p, i: vlm.prepare_embeds(p, cfg, i), params, inputs)

    both = jnp.concatenate([inputs.images, inputs.depths], axis=0)

    # tower pass over 2N images (committed attention config)
    t(
        "tower_2n_s",
        lambda p, x: siglip.forward_features(p["vision"], x, cfg.vision),
        params,
        both,
    )

    # patchify + pos embed only
    t("embed_s", lambda p, x: siglip.embed(p["vision"], x, cfg.vision), params, both)

    # refinement + pooling on precomputed tower features
    tower_fn = jax.jit(
        lambda p, x: siglip.forward_features(p["vision"], x, cfg.vision)
    )
    feats = tower_fn(params, both)
    device_sync(feats)
    tower_rgb, depth_feats = jnp.split(feats, 2, axis=0)
    t(
        "refine_pool_s",
        lambda p, tr, df, m: vlm._refine_and_pool(p["region"], cfg, tr, df, m),
        params,
        tower_rgb,
        depth_feats,
        inputs.masks,
    )

    # ViT attention variants, measured through the full tower pass.
    # (r4 measured: bh4 0.809, bh2 0.807, XLA 0.824 at b64 — all within
    # tunnel noise; bh8/16 configs crash the remote compile service.
    # Attention is no longer the tower's bottleneck.)  Off by default.
    sweep = []
    variants = [(4, None), (8, None), (8, 384), (16, 256), (16, 128), (2, None)]
    if os.environ.get("SRGPT_PREP_SWEEP", "0") != "1":
        variants = []
    for bh, bq in variants:
        siglip.set_vit_knobs(block_h=bh, block_q=bq)
        f = jax.jit(
            lambda p, x: siglip.forward_features(p["vision"], x, cfg.vision)
        )
        try:
            r = f(params, both)
            device_sync(r)
            dt = time_fn(lambda: f(params, both), iters=3, warmup=1)
            sweep.append({"block_h": bh, "block_q": bq, "tower_s": round(dt, 4)})
            print(f"bh={bh} bq={bq}: {dt:.4f}", file=sys.stderr)
        except Exception as e:  # VMEM overflows etc.
            sweep.append({"block_h": bh, "block_q": bq, "error": str(e)[:120]})
            print(f"bh={bh} bq={bq}: FAIL {str(e)[:120]}", file=sys.stderr)
    siglip.set_vit_knobs(block_h=4, block_q=None)

    # XLA-attention tower for reference
    siglip.set_vit_knobs(xla_attn=True)
    try:
        t(
            "tower_2n_xla_attn_s",
            lambda p, x: siglip.forward_features(p["vision"], x, cfg.vision),
            params,
            both,
        )
    finally:
        siglip.set_vit_knobs(xla_attn=False)

    out["vit_sweep"] = sweep
    print(json.dumps(out))


if __name__ == "__main__":
    main()
