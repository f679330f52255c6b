"""Microbench: ViT attention paths at the so400m shape (S=729, H=16, D=72).

Compares, per layer-equivalent call at serving batch (128 images =
rgb+depth at bench batch 64):
  - XLA materialized attention,
  - the generic flash kernel as wired in models/siglip.py today,
  - the specialized ops/vit_attention.py kernel at several block_h.

Run on the real chip: `python scripts/bench_vit_attn.py [B]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.flash_attention import flash_attention
from spatialrgpt_tpu.ops.vit_attention import vit_attention
from spatialrgpt_tpu.utils.timing import device_sync, time_fn

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S, H, D = 729, 16, 72


def xla_attn(q, k, v):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * (D**-0.5), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def flash_as_wired(q, k, v):
    # mirror models/siglip.py::_attention's current call
    block = 768
    pad = block - S
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    seg = jnp.concatenate(
        [jnp.ones((B, S), jnp.int32), jnp.zeros((B, pad), jnp.int32)], axis=1
    )
    return flash_attention(
        qp, kp, vp, segment_ids=seg, causal=False,
        block_q=384, block_k=768, block_h=4,
    )[:, :S]


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)

    variants = {
        "xla": jax.jit(xla_attn),
        "flash_wired(bq384,bh4)": jax.jit(flash_as_wired),
    }
    for bh, bq in ((4, None), (8, 384), (8, 192), (16, 192), (16, 96), (4, 384)):
        variants[f"vit_kernel(bh{bh},bq{bq or 'full'})"] = jax.jit(
            lambda q, k, v, bh=bh, bq=bq: vit_attention(
                q, k, v, block_h=bh, block_q=bq
            )
        )

    ref = None
    for name, fn in variants.items():
        try:
            t0 = time.time()
            out = fn(q, k, v)
            device_sync(out)
            compile_s = time.time() - t0
            ms = time_fn(lambda: fn(q, k, v), iters=10, warmup=2) * 1000
            o32 = np.asarray(out[:2, :8]).astype(np.float32)
            if ref is None:
                ref = o32
                err = 0.0
            else:
                err = float(np.max(np.abs(o32 - ref)))
            print(f"{name:28s} {ms:8.2f} ms  (compile {compile_s:.1f}s, maxdiff {err:.2e})")
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
