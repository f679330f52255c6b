"""Sweep flash-attention bwd block configs at the training shape (TPU).

One process, many configs (amortizes startup; compile cache reused).
Correctness of each bwd-block override is gated in
tests/test_flash_attention.py (interpret mode); here we also spot-check
the first config vs the default-block gradients on-device before timing.

Usage: python scripts/sweep_train_attn.py [--fast]
Writes /tmp/train_attn_sweep.json and prints a table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.flash_attention import flash_attention

B, S, H, D = 4, 4096, 20, 128
ITERS = int(os.environ.get("ITERS", 20))


def timeit(f, *a):
    a = list(a)
    o = f(*a)
    first = o[0] if isinstance(o, (tuple, list)) else o
    jax.block_until_ready(first)
    t0 = time.time()
    for _ in range(ITERS):
        o = f(*a)
        first = o[0] if isinstance(o, (tuple, list)) else o
        a[0] = first.astype(a[0].dtype).reshape(a[0].shape)
    jax.block_until_ready(first)
    return (time.time() - t0) / ITERS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="fewer configs")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    seg = jnp.asarray(
        np.repeat(np.arange(1, 5)[None], B, 0).repeat(S // 4, axis=1), jnp.int32
    )
    fwd_flops = 4 * B * H * S * S * D / 2 / 4  # causal, 4 packed segments

    def make_grad(bq, bk, bqb, bkb):
        return jax.jit(
            jax.grad(
                lambda q, k, v, s: flash_attention(
                    q, k, v, segment_ids=s, causal=True,
                    block_q=bq, block_k=bk,
                    block_q_bwd=bqb, block_k_bwd=bkb,
                ).astype(jnp.float32).sum(),
                argnums=(0, 1, 2),
            )
        )

    # on-device correctness spot-check: overridden bwd blocks must match
    # the default-block gradients bit-for-bit-ish (same math, f32 accum)
    g_ref = make_grad(None, None, None, None)(q, k, v, seg)
    g_alt = make_grad(None, None, 512, 512)(q, k, v, seg)
    for a, b in zip(g_ref, g_alt):
        md = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        assert md < 1e-2, f"bwd-block override changed gradients: maxdiff {md}"
    print("correctness: bwd-block override matches default blocks", flush=True)

    # (block_q, block_k, block_q_bwd, block_k_bwd); None = kernel default
    configs = [
        (None, None, None, None),   # committed default (1024/1024 everywhere)
        (None, None, 512, 512),
        (None, None, 256, 512),
        (None, None, 512, 1024),
        (None, None, 1024, 512),
        (None, None, 256, 1024),
        (None, None, 2048, 512),
        (None, None, 512, 2048),
        (512, 512, None, None),     # fwd blocks too
        (512, 1024, None, None),
        (2048, 1024, None, None),
        (None, None, 128, 1024),
        (None, None, 1024, 256),
    ]
    if args.fast:
        configs = configs[:6]

    rows = []
    for bq, bk, bqb, bkb in configs:
        name = f"fwd={bq or 'def'}/{bk or 'def'} bwd={bqb or 'def'}/{bkb or 'def'}"
        try:
            gfn = make_grad(bq, bk, bqb, bkb)
            ms = timeit(gfn, q, k, v, seg)
            tf = 3.5 * fwd_flops / ms / 1e9
            rows.append({"config": name, "ms": round(ms, 2), "tf": round(tf, 1)})
            print(f"{name:42s} {ms:8.2f} ms  {tf:6.1f} TF/s", flush=True)
        except Exception as e:
            rows.append({"config": name, "error": f"{type(e).__name__}: {e}"[:200]})
            print(f"{name:42s} ERR {type(e).__name__}", flush=True)

    with open("/tmp/train_attn_sweep.json", "w") as f:
        json.dump(rows, f, indent=1)
    ok = [r for r in rows if "ms" in r]
    if ok:
        best = min(ok, key=lambda r: r["ms"])
        print(f"\nbest: {best['config']}  {best['ms']} ms  {best['tf']} TF/s")


if __name__ == "__main__":
    main()
